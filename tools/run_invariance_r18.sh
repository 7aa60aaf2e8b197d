#!/bin/bash
# Round-18 invariance audits at the post-pair-swap HEAD (VERDICT r17 #3):
# the pair-stage rewrite is the first physical change under a green
# registry, so the r16 audits no longer transfer on the "registry
# untouched" argument — re-run all three axes at THIS HEAD and diff each
# against a same-HEAD 12-CPU baseline with tools/digest_dump.py.
set -e
cd /root/repo

SPARK_GRAFT_CPUS=12 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/inv_r18_base" \
  >/tmp/inv_r18_base.log 2>&1
echo "=== base done"

SPARK_GRAFT_CPUS=3 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/inv_r18_cpu3" \
  >/tmp/inv_r18_cpu3.log 2>&1
echo "=== cpu3 done"

JAVA_TOOL_OPTIONS="-Dspark.sql.adaptive.enabled=false" \
  SPARK_GRAFT_CPUS=12 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/inv_r18_aqeoff" \
  >/tmp/inv_r18_aqeoff.log 2>&1
echo "=== aqeoff done"

JAVA_TOOL_OPTIONS="-Dspark.sql.codegen.wholeStage=false -Dspark.sql.codegen.factoryMode=NO_CODEGEN" \
  SPARK_GRAFT_CPUS=12 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/inv_r18_nocodegen" \
  >/tmp/inv_r18_nocodegen.log 2>&1
echo "=== nocodegen done"

for ax in cpu3 aqeoff nocodegen; do
  echo "--- diff base vs $ax:"
  python3 tools/digest_dump.py --diff /tmp/inv_r18_base /tmp/inv_r18_$ax | tail -3
done
echo ALL_DONE
