#!/usr/bin/env bash
# Fixed-protocol (BenchProtocol-shared) refresh of the r8 capped sweeps:
# every op at 5k/50k/500k under the SAME warmup/calib/release code Bench
# uses, replacing the pre-fix probe5/probe6 records protocol-cleanly.
set -u
cd /root/repo
export JAVA_TOOL_OPTIONS="-Dspark.sql.files.maxPartitionBytes=2097152 -Dspark.sql.files.openCostInBytes=262144"
export SPARK_GRAFT_RUNS=1
for op in clusters_capped clean_capped waterfall_capped estimate_capped estimate_store incremental_capped; do
  for p in sfc5k:target/sfc5k sf1:target/sf1 sf10:target/sf10; do
    tag=${p%%:*}; dir=${p#*:}
    echo "=== ${op}_$tag $(date +%H:%M:%S)" >> target/probe7_chain.log
    sbt -batch "runMain graft.ScaleProbe $op $dir" > target/probe7_${op}_$tag.log 2>&1
    grep '^{"op"' target/probe7_${op}_$tag.log | tail -1 > target/probe7_${op}_$tag.json
  done
done
echo "PROBE_R8C_DONE $(date +%H:%M:%S)" >> target/probe7_chain.log
