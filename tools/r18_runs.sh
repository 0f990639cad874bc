#!/bin/bash
# Round-18 measurement chain (closes r17 verdict items #1/#2/#4/#5/#7/#8).
# Sequential on purpose — one Spark JVM at a time owns the 32 threads.
#
# Runs from a CLONE (default /tmp/graft_chain18) so the main working
# tree stays free for concurrent development. Results land in
# /root/repo/results via absolute paths. Bench SLOT runs deliberately
# do NOT run here — Bench writes bench_last_good.json relative to its
# CWD, so slot runs happen in /root/repo itself during quiet windows.
#
#   1. sf1 TPC anchor with canaries (r17 verdict #4) — feeds the
#      two-column (cpu + shuffle canary) COMPARE_r17.md.
#   2. PqBench sf1: raw sweep + NEW residual (v23) recall rows at
#      matched m/ksub/overFetch (verdict #1's recall row) + the
#      10k-query batch LUT A/B (verdict #5).
#   3. PqClusteredBench: the planted-cluster recall fixture
#      (verdict #2) — substantiates or falsifies the standing
#      "production corpora are clustered" defense.
#   4. Serving-tier artifact refresh at r18 HEAD (verdict #7):
#      pq sf10, serve_stream, pq_stream, v16 recall curve, q8serve,
#      v14/v15/v16 solo readings at sf1 + sf10.
#   5. t31 at the production window (verdict #8, stretch): window=50
#      at sf0.1 + sf1 + sf10 with span-table cardinality recorded.
set -x
CHAIN_DIR="${CHAIN_DIR:-/tmp/graft_chain18}"
OUT=/root/repo/results
cd "$CHAIN_DIR" || exit 1
mkdir -p "$OUT/tpc_sf1_r18"

TPCQ=q10_returned_items,q11_important_stock,q12_priority_count,q13_customer_distribution,q14_promo_revenue,q15_top_supplier,q16_supplier_count,q17_small_quantity,q18_large_orders,q19_disjunctive,q1_pricing_summary,q20_heavy_suppliers,q21_waiting_orders,q22_global_sales,q2_min_cost_supplier,q3_shipping_priority,q4_order_priority,q5_local_supplier,q6_forecast_revenue,q7_volume_shipping,q8_market_share,q9_profit
sbt -batch "runMain graft.tools.TpcRunner --data-path /tmp/graft_sf1 --iterations 5 --queries $TPCQ --out $OUT/tpc_sf1_r18" || exit 1

sbt -batch "runMain graft.tools.PqBench /tmp/graft_sf1 $OUT/pq_sf1_r18.json 30 10" || exit 1

sbt -batch "runMain graft.tools.PqClusteredBench $OUT/pq_clustered_r18.json 17000 30 0.5" || exit 1

# ---- serving-tier refresh at r18 HEAD (verdict #7) ----
sbt -batch "runMain graft.tools.PqBench /tmp/graft_sf10 $OUT/pq_sf10_r18.json 30 10" || exit 1
sbt -batch "runMain graft.tools.ServeStreamBench /tmp/graft_sf1 $OUT/serve_stream_sf1_r18.json" || exit 1
sbt -batch "runMain graft.tools.PqStreamBench /tmp/graft_sf1 $OUT/pq_stream_sf1_r18.json" || exit 1
sbt -batch "runMain graft.tools.RecallCurve /tmp/graft_sf10 $OUT/v16_recall_r18.json 10" || exit 1
sbt -batch "runMain graft.tools.Q8ServeBench /tmp/graft_sf10 $OUT/q8serve_sf10_r18.json" || exit 1
for sf in sf1 sf10; do
  SPARK_GRAFT_SF_DIR=/tmp/graft_$sf SPARK_GRAFT_BENCH_OUT=$OUT/v14_${sf}_r18.json \
    sbt -batch "runMain graft.Bench v14_ivf_incremental_dedup" || exit 1
  SPARK_GRAFT_SF_DIR=/tmp/graft_$sf SPARK_GRAFT_BENCH_OUT=$OUT/v15_${sf}_r18.json \
    sbt -batch "runMain graft.Bench v15_ivf_batch_topk" || exit 1
  SPARK_GRAFT_SF_DIR=/tmp/graft_$sf SPARK_GRAFT_BENCH_OUT=$OUT/v16_${sf}_r18.json \
    sbt -batch "runMain graft.Bench v16_ivf_batch_topk_sq8" || exit 1
done

# ---- t31 production-window stretch (verdict #8) ----
sbt -batch "runMain graft.tools.SubstrBench $OUT/t31_scale_r18.json 50 /root/testdata/sf0.1 /tmp/graft_sf1 /tmp/graft_sf10" || exit 1

echo ALL_DONE
