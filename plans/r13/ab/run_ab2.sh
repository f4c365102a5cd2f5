#!/bin/bash
# 3-arm interleaved A/B on this session's first change batch:
#  A=/tmp/r13base (r12 round start), B=/tmp/r13head0 (0fce3e7), C=/root/repo (current)
set -u
Q="q_text_langid,q_eval_prf,q_eval_kappa,q_eval_mcc,q_stats_spearman,q_dedup_simhash,q_dedup_simhash_hamming,q_macro_waiting_suppliers,q_basket_rules"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY="$Q"
for i in 1 2 3; do
  for arm in A B C; do
    case $arm in
      A) dir=/tmp/r13base;; B) dir=/tmp/r13head0;; C) dir=/root/repo;;
    esac
    echo "=== run $i arm $arm $(date +%T) ==="
    (cd "$dir" && sbt -batch "runMain graft.Bench" \
        > /tmp/ab_r13/b2_${arm}_$i.out 2> /tmp/ab_r13/b2_${arm}_$i.err)
    echo "rc=$?"
  done
done
cd /root/repo && git checkout -- BENCH_FULL.json 2>/dev/null
rm -f /root/repo/BENCH_FULL_c32_sf0.1.json /tmp/r13head0/BENCH_FULL*.json
echo "AB2 DONE $(date +%T)"
