#!/bin/bash
# Round-16 measurement chain (closes r15 verdict items #1/#2/#5/#6/#7).
# Sequential on purpose — one Spark JVM at a time owns the 32 threads.
#
# Runs from a CLONE (default /tmp/graft_chain) so the main working tree
# stays free for concurrent development: every `sbt runMain` recompiles
# the tree it runs in, and the r15 post-mortem plus the round-16 plan
# both require the chain to start at round START while code work
# continues — a shared tree would make the chain compile half-finished
# edits. Results always land in /root/repo/results (absolute paths).
#
#   1-2. gr2 solo x2 JVMs        (bimodality adjudication, t26_diag recipe)
#   3.   t8+t26 solo             (the other two bimodal queries, same protocol)
#   4.   shuffled-order headline with gr2 FIRST (position/neighborhood probe;
#        args non-empty so the standing slot is never touched)
#   5.   sf1 TPC anchor with canaries        (r14 verdict #6 / r15 #7)
#   6.   embedding ingest cost curve at sf1  (r14 verdict #7 / r15 #6)
#   7.   v16 recall curve at sf10            (r15 verdict #5)
# All bench JSONs now carry per-sample wall timestamps (samples_ts) and
# per-sample GC seconds (samples_gc) — the discriminating data for the
# burst-vs-JVM question (r15 verdict #2).
set -x
CHAIN_DIR="${CHAIN_DIR:-/tmp/graft_chain}"
OUT=/root/repo/results
cd "$CHAIN_DIR" || exit 1
mkdir -p "$OUT/gr2_diag_r16" "$OUT/tpc_sf1_r16"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT="$OUT/gr2_diag_r16/gr2_solo_1.json" \
  sbt -batch "runMain graft.Bench gr2_triangle_count" || exit 1

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT="$OUT/gr2_diag_r16/gr2_solo_2.json" \
  sbt -batch "runMain graft.Bench gr2_triangle_count" || exit 1

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT="$OUT/gr2_diag_r16/t8_t26_solo.json" \
  sbt -batch "runMain graft.Bench t8_ngram_jaccard,t26_incremental_dedup" || exit 1

SHUF=gr2_triangle_count,v13_incremental_ivf_assign,v12_incremental_embedding_dedup,t26_incremental_dedup,v8_quantized_neardup,v7_quantized_ann,t30_curation_pipeline,gr1_pagerank_copurchase,t25_tfidf,t24_chunk_overlap,t21_simhash_neardup,q2_min_cost_supplier,e3_sessions,e1_events_hourly,v4_embedding_neardup,v1_cosine_topk,t19_neardup_components,t16_block_dedup,t8_ngram_jaccard,t6_minhash_lsh,t1_dedup_exact,pjsql_three_way,pj_right_outer,pj_inner,j_residual_filter,j_left_outer,x1_star_synthetic,star_join4,w1_window_rank,q18_large_orders,q13_customer_distribution,q9_profit,q6_forecast_revenue,q5_local_supplier,q3_shipping_priority,q1_pricing_summary
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT="$OUT/gr2_diag_r16/gr2_shuffled_headline.json" \
  sbt -batch "runMain graft.Bench $SHUF" || exit 1

TPCQ=q10_returned_items,q11_important_stock,q12_priority_count,q13_customer_distribution,q14_promo_revenue,q15_top_supplier,q16_supplier_count,q17_small_quantity,q18_large_orders,q19_disjunctive,q1_pricing_summary,q20_heavy_suppliers,q21_waiting_orders,q22_global_sales,q2_min_cost_supplier,q3_shipping_priority,q4_order_priority,q5_local_supplier,q6_forecast_revenue,q7_volume_shipping,q8_market_share,q9_profit
sbt -batch "runMain graft.tools.TpcRunner --data-path /tmp/graft_sf1 --iterations 5 --queries $TPCQ --out $OUT/tpc_sf1_r16" || exit 1

SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  sbt -batch "runMain graft.tools.IngestBench /tmp/graft_sf1 10 $OUT/ingest_embed_sf1_r16.json embedding" || exit 1

sbt -batch "runMain graft.tools.RecallCurve /tmp/graft_sf10 $OUT/v16_recall_r16.json 10" || exit 1

echo ALL_DONE
