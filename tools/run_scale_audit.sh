#!/bin/bash
# Scale-curve audit (VERDICT r15 #3, extended ×100 in r17). Builds the
# synthetic decades, then runs the expensive-family bench at 6 scales.
# Sequential: never two JVMs. The x100uniq leg needs a larger driver heap
# (500k-doc pair graphs; the 8g default OOM-failed q90/q265 when first
# tried) — SPARK_DRIVER_MEM=48g below.
# Fit: python3 tools/fit_scale.py 1:sf0.1=target/scale_bench_sf0.1.json \
#   10:x10uniq=target/scale_bench_x10uniq.json \
#   100:x100uniq=target/scale_bench_x100uniq.json
set -e
cd /root/repo
FAM="q80_dedup_clusters,q90_jaccard_prefix,q96_leakage_split,q243_incremental_cc,q248_threshold_sweep,q263_component_snapshot,q265_keyed_trailing_quantiles"

sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 target/scale/x10uniq 10 uniq" >/tmp/scaleup_uniq.log 2>&1
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 target/scale/x10dup 10 dup" >/tmp/scaleup_dup.log 2>&1
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 target/scale/x100uniq 100 uniq" >/tmp/scaleup_x100uniq.log 2>&1

for tag in sf0.001:/root/testdata/sf0.001 sf0.01:/root/testdata/sf0.01 sf0.1:/root/testdata/sf0.1 x10uniq:/root/repo/target/scale/x10uniq x10dup:/root/repo/target/scale/x10dup x100uniq:/root/repo/target/scale/x100uniq; do
  name="${tag%%:*}"; dir="${tag#*:}"
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_ONLY="$FAM" \
    sbt -batch "runMain graft.Bench" >/tmp/scalebench_$name.log 2>&1
  cp target/bench_full.json target/scale_bench_$name.json
  echo "=== $name done: $(grep -o '"value":[0-9.]*' target/scale_bench_$name.json | head -1)"
done
echo ALL_DONE
