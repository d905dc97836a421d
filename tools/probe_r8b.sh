#!/usr/bin/env bash
# x2h scale probe: estimator vs capped estimator at 5k/50k/500k docs,
# same protocol as probe5 (split partitions, single run).
set -u
cd /root/repo
export JAVA_TOOL_OPTIONS="-Dspark.sql.files.maxPartitionBytes=2097152 -Dspark.sql.files.openCostInBytes=262144"
export SPARK_GRAFT_RUNS=1
for op in estimate_capped estimate; do
  for p in sfc5k:target/sfc5k sf1:target/sf1 sf10:target/sf10; do
    tag=${p%%:*}; dir=${p#*:}
    echo "=== ${op}_$tag $(date +%H:%M:%S)" >> target/probe6_chain.log
    sbt -batch "runMain graft.ScaleProbe $op $dir" > target/probe6_${op}_$tag.log 2>&1
    grep '^{"op"' target/probe6_${op}_$tag.log | tail -1 > target/probe6_${op}_$tag.json
  done
done
echo "PROBE_R8B_DONE $(date +%H:%M:%S)" >> target/probe6_chain.log
