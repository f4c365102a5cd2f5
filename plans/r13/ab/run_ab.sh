#!/bin/bash
# Interleaved A/B: base (/tmp/r13base @ 5b81c05) vs HEAD (/root/repo @ 0fce3e7).
# 3 rounds of (base, head), subset bench at sf0.1 local[32], reps 3.
set -u
Q=$(cat /tmp/ab_r13/queries.txt)
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY="$Q"
for i in 1 2 3; do
  for arm in base head; do
    dir=/tmp/r13base; [ "$arm" = head ] && dir=/root/repo
    echo "=== run $i arm $arm $(date +%T) ==="
    (cd "$dir" && sbt -batch "runMain graft.Bench" \
        > /tmp/ab_r13/${arm}_$i.out 2> /tmp/ab_r13/${arm}_$i.err)
    echo "rc=$?"
  done
done
# restore the repo artifact the HEAD runs clobbered
cd /root/repo && git checkout -- BENCH_FULL.json 2>/dev/null
rm -f /root/repo/BENCH_FULL_c32_sf0.1.json
echo "AB DONE $(date +%T)"
