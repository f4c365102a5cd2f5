#!/bin/bash
# Interleaved A/B: round-start bits (18854ad, /tmp/base_repo) vs HEAD
# (/root/repo) over the touched-query family. 2 pairs, reps=3, same box.
set -u
FAM=q_dedup_near_minhash,q_dedup_cluster,q_dedup_cluster_sizes,q_dedup_canonical,q_dedup_soft_weights,q_dedup_lang_purity,q_dedup_from_signatures,q_dedup_incremental,q_dedup_minhash_capped,q_split_leakage_safe,q_curate_funnel,q_dedup_pr_report,q_embed_pca_power,q_embed_mmr,q_embed_knn_graph,q_embed_hard_negatives,q_eval_kappa,q_agg_histogram_eqdepth,q_text_rake,q_stats_permutation,q_graph_pagerank,q_graph_modularity,q_graph_lpa,q_graph_rcte,q_graph_harmonic,q_graph_assortativity,q_graph_reachability,q_graph_kcore,q_graph_sssp,q_graph_triangles,q_graph_random_walk,q_graph_degree_dist,q_graph_linkpred,q_graph_clustering_coeff,q_dedup_simhash_hamming,q_dedup_containment,q_dedup_ngram_jaccard,q_sim_hubness,q_events_copresence,q_dedup_sorted_neighborhood,q_dedup_substring,q_dedup_substring_mass,q_sim_rrf_fusion,q_sim_cosine_topk,q_sim_radius,q_sim_ann_lsh,q_sim_ann_multiprobe,q_sim_prefix_rerank,q_sim_quantized_topk,q_sim_knn_classify,q_eval_ranking,q_dedup_semantic,q_sim_recall_report,q_sim_threshold_sweep,q_sim_bucket_purity,q_dedup_embed_cosine,q_basket_rules,q_distinct_kmv_setops,q_distinct_kmv,q_events_ks,q_events_mannwhitney,q_stats_median_ci,q_stats_gini,q_macro_abc,q_macro_pareto_share,q_stats_spearman,q_events_churn_rate,q_events_resurrection,q_text_char_ngram_sim,q_curate_dsir,q_eval_lift
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_BENCH_REPS=3
export SPARK_GRAFT_BENCH_ONLY=$FAM
for i in 1 2; do
  cd /tmp/base_repo
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*' | head -1 > /tmp/ab_base_$i.json
  cd /root/repo
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*' | head -1 > /tmp/ab_head_$i.json
done
echo AB-DONE
