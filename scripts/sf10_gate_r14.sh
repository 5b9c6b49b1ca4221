#!/bin/bash
# r14 sf10 gate: the 51 document-dependent keys (the r14 ScaleUp
# corpus change + multimodal re-band altered exactly these; the other
# 194 keys read tables whose ScaleUp derivation is unchanged, so the
# r13 full-245 sf10 gate stands for them). Verify in 3 fixture-family
# chunks, 3-way parallel, then one DuckDB compare.
set -u
cd /root/repo
mkdir -p logs
cat > target/r14_chunk_dedup.txt <<'EOF'
llm_near_dedup llm_ngram_jaccard llm_containment llm_span_dedup llm_edit_distance llm_dedup_apply llm_dedup_incremental llm_dup_clusters llm_exact_dedup llm_simhash
EOF
cat > target/r14_chunk_mmcur.txt <<'EOF'
llm_image_dedup llm_video_dedup llm_frame_sample llm_multimodal_decode llm_multimodal scan_binaryfile scan_text llm_shuffle llm_split llm_packing llm_chunking llm_pii_redact llm_contamination llm_domain_mix llm_heuristic_filter llm_repetition llm_token_count llm_bloom_filter llm_curation_e2e llm_dedup_url
EOF
cat > target/r14_chunk_textfn.txt <<'EOF'
llm_bm25 llm_tfidf llm_bpe_pairs llm_classifier_score llm_dsir llm_entropy llm_fingerprint llm_inverted_index llm_lang_id llm_lm_score llm_pmi llm_ppl_buckets llm_quality llm_text_stats llm_winnow fn_array fn_explode fn_map fn_regex fn_struct fn_url
EOF
run() {
  c=$1
  echo "[gate] chunk $c start $(date +%T)"
  SPARK_GRAFT_CPUS=10 SPARK_DRIVER_MEM=20g SPARK_GRAFT_MAX_RESULT=8g \
    SPARK_GRAFT_STREAM_SINK=parquet \
    scripts/run_main.sh graft.Verify data/sf10 target/verify_sf10_r14 \
    $(cat target/r14_chunk_$c.txt) > logs/verify_sf10_r14_$c.log 2>&1
  echo "[gate] chunk $c done rc=$? $(date +%T)"
}
export -f run
printf '%s\n' dedup mmcur textfn | xargs -P3 -I{} bash -c 'run {}'
echo "[gate] verify chunks done; ok=$(grep -h '\[verify\]' logs/verify_sf10_r14_*.log | grep -c ' ok in ')"
grep -h "\[verify\].*failed" logs/verify_sf10_r14_*.log || echo "[gate] zero verify failures"
