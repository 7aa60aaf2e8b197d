#!/bin/bash
# Round-18 re-fit of the pair-graph families after the join-based
# pair-stage swap (VERDICT r17 #1 "Done" criterion): same protocol as
# tools/run_scale_audit.sh (min-of-3, local[32], shuffle.partitions=32,
# 48g driver), scaled dirs already built by r17's ScaleUp runs; the
# family list adds the rewritten LSH/SimHash/uncapped-exact rows
# (q42/q43/q44) so the band-site rewrite is priced at x100 too.
set -e
cd /root/repo
FAM="q42_jaccard_pairs,q43_minhash_lsh,q44_simhash,q80_dedup_clusters,q90_jaccard_prefix,q96_leakage_split,q243_incremental_cc,q248_threshold_sweep,q263_component_snapshot,q265_keyed_trailing_quantiles"
for tag in sf0.1:/root/testdata/sf0.1 x10uniq:/root/repo/target/scale/x10uniq x100uniq:/root/repo/target/scale/x100uniq; do
  name="${tag%%:*}"; dir="${tag#*:}"
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_ONLY="$FAM" \
    sbt -batch "runMain graft.Bench" >/tmp/r18_scalebench_$name.log 2>&1
  cp target/bench_full.json target/scale_bench_r18_$name.json
  echo "=== $name done: $(grep -o '"value":[0-9.]*' target/scale_bench_r18_$name.json | head -1)"
done
echo ALL_DONE
