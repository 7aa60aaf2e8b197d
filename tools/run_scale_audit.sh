#!/bin/bash
# Round-16 scale-curve audit (VERDICT r15 #3). Builds x10 dirs, then runs
# the expensive-family bench at 5 scales. Sequential: never two JVMs.
set -e
cd /root/repo
FAM="q80_dedup_clusters,q90_jaccard_prefix,q96_leakage_split,q243_incremental_cc,q248_threshold_sweep,q263_component_snapshot,q265_keyed_trailing_quantiles"

sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 target/scale/x10uniq 10 uniq" >/tmp/scaleup_uniq.log 2>&1
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 target/scale/x10dup 10 dup" >/tmp/scaleup_dup.log 2>&1

for tag in sf0.001:/root/testdata/sf0.001 sf0.01:/root/testdata/sf0.01 sf0.1:/root/testdata/sf0.1 x10uniq:/root/repo/target/scale/x10uniq x10dup:/root/repo/target/scale/x10dup; do
  name="${tag%%:*}"; dir="${tag#*:}"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_RUNS=3 \
    SPARK_GRAFT_BENCH_ONLY="$FAM" \
    sbt -batch "runMain graft.Bench" >/tmp/scalebench_$name.log 2>&1
  cp target/bench_full.json target/scale_bench_$name.json
  echo "=== $name done: $(grep -o '"value":[0-9.]*' target/scale_bench_$name.json | head -1)"
done
echo ALL_DONE
