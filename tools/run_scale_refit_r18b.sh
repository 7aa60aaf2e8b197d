#!/bin/bash
# Round-18 (this session) re-fit at the post-constant-cut HEAD. The
# sandbox wiped target/scale between sessions; ScaleUp is deterministic,
# so the x10uniq/x100uniq corpora rebuild bit-identically first. Protocol
# otherwise identical to tools/run_scale_refit_r18.sh (min-of-3,
# local[32], shuffle.partitions=32, 48g driver).
set -e
cd /root/repo
if [ ! -d target/scale/x10uniq ]; then
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 target/scale/x10uniq 10 uniq" >/tmp/scaleup_x10_r18b.log 2>&1
  echo "=== x10uniq built"
fi
if [ ! -d target/scale/x100uniq ]; then
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 target/scale/x100uniq 100 uniq" >/tmp/scaleup_x100_r18b.log 2>&1
  echo "=== x100uniq built"
fi
FAM="q42_jaccard_pairs,q80_dedup_clusters,q90_jaccard_prefix,q96_leakage_split,q229_scc,q243_incremental_cc,q248_threshold_sweep,q263_component_snapshot,q265_keyed_trailing_quantiles"
for tag in sf0.1:/root/testdata/sf0.1 x10uniq:/root/repo/target/scale/x10uniq x100uniq:/root/repo/target/scale/x100uniq; do
  name="${tag%%:*}"; dir="${tag#*:}"
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_ONLY="$FAM" \
    sbt -batch "runMain graft.Bench" >/tmp/r18b_scalebench_$name.log 2>&1
  cp target/bench_full.json target/scale_bench_r18b_$name.json
  echo "=== $name done: $(grep -o '"value":[0-9.]*' target/scale_bench_r18b_$name.json | head -1)"
done
echo ALL_DONE
