#!/bin/bash
# Round-22 measurement chain: serving-tier artifact refresh at r22 HEAD
# (r21 verdict #9, standing cadence), the clean-window noise-closure
# slice for the r21 flagged rows (verdict #8), and the committed
# full-suite sf0.1 hash-exact gate receipt.
# Sequential on purpose — one Spark JVM at a time owns the 32 threads.
# Runs from /root/repo; /tmp/graft_sf1 must exist (ScaleUp — see
# r22_sf1_slice.sh step 0).
set -x
cd /root/repo || exit 1
OUT=results

# 0. sf1 slice input (idempotent if already built this session)
[ -d /tmp/graft_sf1 ] || \
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 10 /tmp/graft_sf1" || exit 1

# 1. serving-tier artifact refresh at r22 HEAD
sbt -batch "runMain graft.tools.PqBench /tmp/graft_sf1 $OUT/pq_sf1_r22.json 30 10" || exit 1
sbt -batch "runMain graft.tools.ServeStreamBench /tmp/graft_sf1 $OUT/serve_stream_sf1_r22.json" || exit 1
sbt -batch "runMain graft.tools.PqStreamBench /tmp/graft_sf1 $OUT/pq_stream_sf1_r22.json" || exit 1
sbt -batch "runMain graft.tools.Q8ServeBench /tmp/graft_sf1 $OUT/q8serve_sf1_r22.json" || exit 1
for q in v14_ivf_incremental_dedup v15_ivf_batch_topk v16_ivf_batch_topk_sq8 v17_ivf_persisted_serving; do
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_BENCH_OUT=$OUT/${q%%_*}_sf1_r22.json \
    sbt -batch "runMain graft.Bench $q" || exit 1
done

# 2. verdict #8: clean-window focused slice for the rows the r21 window
#    flagged (+19-31% on untouched code) — canary-normed closure
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=$OUT/watch_r22_flagged.json \
  sbt -batch "runMain graft.Bench q3_shipping_priority,q5_local_supplier,e1_events_hourly,v12_incremental_embedding_dedup,t24_chunk_overlap,t26_incremental_dedup" || exit 1

# 3. full-suite sf0.1 hash-exact gate, receipt COMMITTED under results/
GRAFT_DUCK_SPILL=/tmp/duck_spill_r22 \
  python3 tools/verify_local.py /root/testdata/sf0.1 /tmp/graft_verify_sf01 \
  2>&1 | tee /tmp/verify_sf01_r22.log
python3 - <<'EOF' || exit 1
import json
lines = open('/tmp/verify_sf01_r22.log').read().splitlines()
ok = [l.split()[1].rstrip(':') for l in lines if l.startswith('OK ')]
rowsonly = [l.split()[1].rstrip(':') for l in lines if l.startswith('ROWSONLY')]
fails = [l for l in lines if l.startswith('MISMATCH') or l.startswith('MISSING')]
tail = [l for l in lines if 'failures' in l]
summary = {
  'round': 22, 'sf': '/root/testdata/sf0.1',
  'entries_ok': len(ok), 'entries_rowsonly': len(rowsonly),
  'failures': fails, 'tail': tail,
  'duckdb_spill': '/tmp/duck_spill_r22',
}
with open('/root/repo/results/full_suite_sf0.1_r22.json', 'w') as f:
    json.dump(summary, f, indent=1)
print('receipt:', summary['entries_ok'], 'ok,', len(fails), 'failures')
EOF
echo "r22 chain complete"
