#!/bin/bash
# Round-20 measurement chain (closes r19 verdict items #2/#6/#7).
# Sequential on purpose — one Spark JVM at a time owns the 32 threads.
#
# Runs from a CLONE (default /tmp/graft_chain20) so the main working
# tree stays free for concurrent development. Results land in
# /root/repo/results via absolute paths. Bench SLOT runs deliberately
# do NOT run here — Bench writes bench_last_good.json relative to its
# CWD, so slot runs happen in /root/repo itself during quiet windows.
#
#   1. Regenerate /tmp/graft_sf1 (ScaleUp output does not survive
#      between sessions).
#   2. PqClusteredBench BOTH regimes (isotropic + aniso=4) at m=8 —
#      now carrying the v36 opq_residual arm per ksub (verdict #2's
#      recall rows) and the one-dial v32 batched / v34 ingest-screen
#      serving rows (verdict #6).
#   3. Serving-tier artifact refresh at r20 HEAD (verdict #7):
#      pq sf1 (raw + residual + batch), serve_stream, pq_stream,
#      q8serve, and the v14-v17 solo readings at sf1.
set -x
CHAIN_DIR="${CHAIN_DIR:-/tmp/graft_chain20}"
OUT=/root/repo/results
cd "$CHAIN_DIR" || exit 1

sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 10 /tmp/graft_sf1" || exit 1

sbt -batch "runMain graft.tools.PqClusteredBench $OUT/pq_clustered_r20.json 17000 30 0.5" || exit 1
sbt -batch "runMain graft.tools.PqClusteredBench $OUT/pq_clustered_aniso_r20.json 17000 30 0.5 4" || exit 1

sbt -batch "runMain graft.tools.PqBench /tmp/graft_sf1 $OUT/pq_sf1_r20.json 30 10" || exit 1
sbt -batch "runMain graft.tools.ServeStreamBench /tmp/graft_sf1 $OUT/serve_stream_sf1_r20.json" || exit 1
sbt -batch "runMain graft.tools.PqStreamBench /tmp/graft_sf1 $OUT/pq_stream_sf1_r20.json" || exit 1
sbt -batch "runMain graft.tools.Q8ServeBench /tmp/graft_sf1 $OUT/q8serve_sf1_r20.json" || exit 1
for q in v14_ivf_incremental_dedup v15_ivf_batch_topk v16_ivf_batch_topk_sq8 v17_ivf_serve_persisted; do
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_BENCH_OUT=$OUT/${q%%_*}_sf1_r20.json \
    sbt -batch "runMain graft.Bench $q" || exit 1
done
echo "r20 chain complete"
