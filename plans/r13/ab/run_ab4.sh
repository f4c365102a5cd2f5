#!/bin/bash
# Batch-2 decision A/B at sf1 (the scale the seams target):
# D=/tmp/r13head0 (pre-seam, code-identical for these queries)
# E=/root/repo (batch-2 seams). reps=1, 2 interleaved rounds, minima.
set -u
Q="q_sim_ann_pq,q_sim_ann_ivfpq,q_ts_theil_sen,q_stats_mann_kendall,q_ts_lttb,q_ts_macd,q_stats_fdr_bh,q_macro_share_nested,q_macro_important_stock,q_curate_funnel"
export SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY="$Q"
export SPARK_GRAFT_BENCH_REPS=1
for i in 1 2; do
  for arm in D E; do
    case $arm in D) dir=/tmp/r13head0;; E) dir=/root/repo;; esac
    echo "=== sf1 run $i arm $arm $(date +%T) ==="
    (cd "$dir" && sbt -batch "runMain graft.Bench" \
        > /tmp/ab_r13/b4_${arm}_$i.out 2> /tmp/ab_r13/b4_${arm}_$i.err)
    echo "rc=$?"
  done
done
cd /root/repo && git checkout -- BENCH_FULL.json 2>/dev/null
rm -f /root/repo/BENCH_FULL_c32_sf1.json /tmp/r13head0/BENCH_FULL*.json
echo "AB4 DONE $(date +%T)"
