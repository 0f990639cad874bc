#!/bin/bash
# Round-21 measurement chain (optimization round 1): serving-tier
# artifact refresh at r21 HEAD — the r20 verdict's standing condition #7
# — plus the committed full-suite sf0.1 hash-exact gate receipt
# (verdict What's-wrong #2: the r20 receipt lived in /tmp and died with
# the session).
# Sequential on purpose — one Spark JVM at a time owns the 32 threads.
#
# Runs from a CLONE (default /tmp/graft_chain21) so the main working
# tree stays free for concurrent development. Results land in
# /root/repo/results via absolute paths. Bench SLOT runs deliberately
# do NOT run here — Bench writes bench_last_good.json relative to its
# CWD, so slot runs happen in /root/repo itself during quiet windows.
set -x
CHAIN_DIR="${CHAIN_DIR:-/tmp/graft_chain21}"
OUT=/root/repo/results
cd "$CHAIN_DIR" || exit 1

# 1. the sf1 slice (ScaleUp output does not survive between sessions)
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 10 /tmp/graft_sf1" || exit 1

# 2. serving-tier artifact refresh at r21 HEAD
sbt -batch "runMain graft.tools.PqBench /tmp/graft_sf1 $OUT/pq_sf1_r21.json 30 10" || exit 1
sbt -batch "runMain graft.tools.ServeStreamBench /tmp/graft_sf1 $OUT/serve_stream_sf1_r21.json" || exit 1
sbt -batch "runMain graft.tools.PqStreamBench /tmp/graft_sf1 $OUT/pq_stream_sf1_r21.json" || exit 1
sbt -batch "runMain graft.tools.Q8ServeBench /tmp/graft_sf1 $OUT/q8serve_sf1_r21.json" || exit 1
for q in v14_ivf_incremental_dedup v15_ivf_batch_topk v16_ivf_batch_topk_sq8 v17_ivf_persisted_serving; do
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_BENCH_OUT=$OUT/${q%%_*}_sf1_r21.json \
    sbt -batch "runMain graft.Bench $q" || exit 1
done

# 3. full-suite sf0.1 hash-exact gate, receipt COMMITTED under results/
#    (GRAFT_DUCK_SPILL lets the heavy unrolled-CTE oracles spill)
cd /root/repo || exit 1
GRAFT_DUCK_SPILL=/tmp/duck_spill_r21 \
  python3 tools/verify_local.py /root/testdata/sf0.1 /tmp/graft_verify_sf01 \
  2>&1 | tee /tmp/verify_sf01_r21.log
python3 - <<'EOF' || exit 1
import json, re, time
lines = open('/tmp/verify_sf01_r21.log').read().splitlines()
ok = [l.split()[1].rstrip(':') for l in lines if l.startswith('OK ')]
rowsonly = [l.split()[1].rstrip(':') for l in lines if l.startswith('ROWSONLY')]
fails = [l for l in lines if l.startswith('MISMATCH') or l.startswith('MISSING')]
tail = [l for l in lines if 'failures' in l]
summary = {
  'round': 21, 'sf': '/root/testdata/sf0.1',
  'entries_ok': len(ok), 'entries_rowsonly': len(rowsonly),
  'failures': fails, 'tail': tail,
  'duckdb_spill': '/tmp/duck_spill_r21',
}
with open('/root/repo/results/full_suite_sf0.1_r21.json', 'w') as f:
    json.dump(summary, f, indent=1)
print('receipt:', summary['entries_ok'], 'ok,', len(fails), 'failures')
EOF
echo "r21 chain complete"
