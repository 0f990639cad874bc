#!/bin/bash
# Round-17 measurement chain (closes r16 verdict items #4/#6/#7).
# Sequential on purpose — one Spark JVM at a time owns the 32 threads.
#
# Runs from a CLONE (default /tmp/graft_chain17) so the main working
# tree stays free for concurrent development (the r16 recipe: every
# `sbt runMain` recompiles the tree it runs in). Results land in
# /root/repo/results via absolute paths. The standing-slot bench
# refreshes (r16 verdict #1) deliberately do NOT run here — Bench
# writes bench_last_good.json relative to its CWD, so slot runs happen
# in /root/repo itself during quiet windows.
#
#   1. sf1 TPC anchor with canaries (r16 verdict #6) — both sides of
#      the r17-vs-r16 compare now carry native canaries.
#   2. streaming ANN serving cost split (r16 verdict #4): per-micro-
#      batch wall at sf1 for ~1k/~10k batches x exact/SQ8 arms, plus
#      the per-batch ivfLoad re-resolution cost sampled solo.
#   3. q8serve COLD (r16 verdict #7): persisted-projection vs inline-
#      quantize serving with a fresh JVM per sample and the OS page
#      cache dropped before every invocation, arms INTERLEAVED across
#      JVMs (the r16 lesson: sequential A/B reads phantom deltas).
#      Runs LAST: it deliberately trashes the page cache.
set -x
CHAIN_DIR="${CHAIN_DIR:-/tmp/graft_chain17}"
OUT=/root/repo/results
cd "$CHAIN_DIR" || exit 1
mkdir -p "$OUT/tpc_sf1_r17"

TPCQ=q10_returned_items,q11_important_stock,q12_priority_count,q13_customer_distribution,q14_promo_revenue,q15_top_supplier,q16_supplier_count,q17_small_quantity,q18_large_orders,q19_disjunctive,q1_pricing_summary,q20_heavy_suppliers,q21_waiting_orders,q22_global_sales,q2_min_cost_supplier,q3_shipping_priority,q4_order_priority,q5_local_supplier,q6_forecast_revenue,q7_volume_shipping,q8_market_share,q9_profit
sbt -batch "runMain graft.tools.TpcRunner --data-path /tmp/graft_sf1 --iterations 5 --queries $TPCQ --out $OUT/tpc_sf1_r17" || exit 1

sbt -batch "runMain graft.tools.ServeStreamBench /tmp/graft_sf1 $OUT/serve_stream_sf1_r17.json" || exit 1

IDX=/tmp/graft_q8cold_idx
rm -f "$OUT/q8cold_sf10_r17.jsonl"
sbt -batch "runMain graft.tools.Q8ColdBench prepare /tmp/graft_sf10 $IDX" || exit 1
for i in 1 2 3; do
  for arm in bytes inline; do
    # a FAILED drop must abort, not silently record warm readings into
    # an artifact labeled cold (round-17 self-review)
    sync && echo 3 > /proc/sys/vm/drop_caches || exit 1
    sbt -batch "runMain graft.tools.Q8ColdBench run $IDX $arm 16 $OUT/q8cold_sf10_r17.jsonl" || exit 1
  done
done

echo ALL_DONE
