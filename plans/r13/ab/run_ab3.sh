#!/bin/bash
# Batch-2 interleaved A/B: D=/tmp/r13head0 (code-identical baseline for
# these 10 queries) vs E=/root/repo (batch-2 seams)
set -u
Q="q_sim_ann_pq,q_sim_ann_ivfpq,q_ts_theil_sen,q_stats_mann_kendall,q_ts_lttb,q_ts_macd,q_stats_fdr_bh,q_macro_share_nested,q_macro_important_stock,q_curate_funnel"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY="$Q"
for i in 1 2 3; do
  for arm in D E; do
    case $arm in D) dir=/tmp/r13head0;; E) dir=/root/repo;; esac
    echo "=== run $i arm $arm $(date +%T) ==="
    (cd "$dir" && sbt -batch "runMain graft.Bench" \
        > /tmp/ab_r13/b3_${arm}_$i.out 2> /tmp/ab_r13/b3_${arm}_$i.err)
    echo "rc=$?"
  done
done
cd /root/repo && git checkout -- BENCH_FULL.json 2>/dev/null
rm -f /root/repo/BENCH_FULL_c32_sf0.1.json /tmp/r13head0/BENCH_FULL*.json
echo "AB3 DONE $(date +%T)"
