#!/bin/bash
# VERDICT r12 item 7: demonstrate parallel scaling at sf1 (sf0.1 is
# overhead-bound). Generate sf1 (classic mode, 10x) then run the
# committed bench over the top-25 queries at 32 and at 8 cores,
# interleaved twice (c32, c8, c32, c8) - per-query MINIMA per arm give
# the 8-core/32-core ratio table.
set -u
cd /root/repo
if [ ! -d scale-data/sf1/lineitem.parquet ] && [ ! -f scale-data/sf1/lineitem.parquet ]; then
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 scale-data/sf1 10" \
    > /tmp/ab_r13/sf1_gen.out 2>&1
  echo "gen rc=$?"
fi
Q="q_dedup_cluster,q_dedup_from_signatures,q_stats_permutation,q_dedup_soft_weights,q_dedup_cluster_sizes,q_basket_rules,q_curate_funnel,q_dedup_canonical,q_dedup_pr_report,q_split_leakage_safe,q_dedup_simhash_hamming,q_dedup_lang_purity,q_embed_mmr,q_stats_spearman,q_dedup_near_minhash,q_agg_histogram_eqdepth,q_etl_merge_upsert,q_dedup_substring,q_dedup_incremental,q_dedup_minhash_capped,q_text_rake,q_text_char_ngram_sim,q_dedup_containment,q_embed_pca_power,q_join_skew_salted"
export SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf1
export SPARK_GRAFT_BENCH_ONLY="$Q"
export SPARK_GRAFT_BENCH_REPS=1
for i in 1 2; do
  for c in 32 8; do
    echo "=== sf1 run $i cpus $c $(date +%T) ==="
    SPARK_GRAFT_CPUS=$c sbt -batch "runMain graft.Bench" \
      > /tmp/ab_r13/sf1_c${c}_$i.out 2> /tmp/ab_r13/sf1_c${c}_$i.err
    echo "rc=$?"
  done
done
git checkout -- BENCH_FULL.json 2>/dev/null
rm -f BENCH_FULL_c32_sf1.json BENCH_FULL_c8_sf1.json
echo "SF1 DONE $(date +%T)"
