#!/bin/bash
# funnel r-seam-only variant (+ kept-site sanity): D=/tmp/r13head0 vs E=/root/repo
set -u
Q="q_curate_funnel,q_ts_theil_sen,q_sim_ann_pq,q_macro_important_stock"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY="$Q"
for i in 1 2 3; do
  for arm in D E; do
    case $arm in D) dir=/tmp/r13head0;; E) dir=/root/repo;; esac
    echo "=== run $i arm $arm $(date +%T) ==="
    (cd "$dir" && sbt -batch "runMain graft.Bench" \
        > /tmp/ab_r13/b5_${arm}_$i.out 2> /tmp/ab_r13/b5_${arm}_$i.err)
  done
done
git checkout -- BENCH_FULL.json 2>/dev/null
rm -f /root/repo/BENCH_FULL_c32_sf0.1.json /tmp/r13head0/BENCH_FULL*.json
echo "AB5 DONE $(date +%T)"
