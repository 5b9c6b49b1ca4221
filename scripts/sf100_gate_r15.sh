#!/bin/bash
# r15 sf100 gate (VERDICT r14 item 7, resuming the r13 failure
# analysis): the 65-key subset, verified in SMALL chunks run ONE AT A
# TIME in a fresh JVM each — the r13 failure ran all 65 keys in one JVM
# (GCLocker churn on 1 GB array allocations after dozens of keys of
# accumulated state, then SparkContext shutdown) — with the
# reliable-checkpoint knob ACTUALLY set this time (the r13 runs
# self-identified ckpt:local; iterative rounds died inside
# localCheckpoint under memory pressure; reliable checkpoint() writes
# rounds to disk and frees executor storage).
# 16 threads, not 32: fewer concurrent tasks = more execution memory
# per task (the r13 UNABLE_TO_ACQUIRE_MEMORY class).
set -u
cd /root/repo
mkdir -p logs target/ckpt_sf100
CHUNKS=(
  "sql_tpch_q1 sql_tpch_q3 sql_tpch_q4 sql_tpch_q5 sql_tpch_q6"
  "sql_tpch_q7 sql_tpch_q8 sql_tpch_q12 sql_tpch_q13 sql_tpch_q14"
  "sql_tpch_q17 sql_tpch_q19 sql_tpch_q22 agg_hash agg_stats agg_distinct agg_corr"
  "agg_ab_test agg_percentile agg_hist agg_mode agg_cube agg_rollup agg_grouping_sets agg_heavy_hitters agg_approx_distinct"
  "topk_global topk_grouped etl_incremental etl_scd1 etl_scd2 etl_wap etl_dq_profile_approx etl_dq_check etl_audit etl_fk_check"
  "scan_skipping sink_zstd sink_partitioned stream_tumbling stream_ewma stream_stateful stream_tws stream_heavy_hitters"
  "graph_degree graph_cc graph_label_prop graph_triangles win_funnel win_drawdown"
  "llm_token_count llm_quality llm_lang_id llm_text_stats llm_exact_dedup llm_domain_mix llm_image_dedup llm_curation_e2e"
  "join_broadcast join_dpp join_bloom join_aqe_skew join_salted sample_weighted sample_stratified"
)
i=0
for keys in "${CHUNKS[@]}"; do
  i=$((i+1))
  echo "[sf100] chunk $i start $(date +%T): $keys"
  SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=64g SPARK_GRAFT_MAX_RESULT=8g \
    SPARK_GRAFT_STREAM_SINK=parquet \
    SPARK_GRAFT_CHECKPOINT_DIR=/root/repo/target/ckpt_sf100 \
    scripts/run_main.sh graft.Verify data/sf100 target/verify_sf100_r15 \
    $keys > logs/verify_sf100_r15_$i.log 2>&1
  echo "[sf100] chunk $i done rc=$? $(date +%T)"
  # bound the checkpoint dir between chunks (each chunk is a fresh
  # JVM; its cuts are dead weight once the chunk's outputs are dumped)
  rm -rf /root/repo/target/ckpt_sf100 && mkdir -p /root/repo/target/ckpt_sf100
  df -h / | tail -1
done
echo "[sf100] verify ok=$(grep -h '\[verify\]' logs/verify_sf100_r15_*.log | grep -c ' ok in ')"
grep -h "\[verify\].*failed" logs/verify_sf100_r15_*.log || echo "[sf100] zero verify failures"
