#!/usr/bin/env bash
# Heavy-operator scale chain, uniform protocol: single run per query,
# 48g driver heap (32 local executor threads x 1.5g — a realistic
# per-core executor budget; the 8g default starved 32 concurrent tasks
# at 500k docs), pre-split scan partitions.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=48g
export JAVA_TOOL_OPTIONS="-Dspark.sql.files.maxPartitionBytes=2097152 -Dspark.sql.files.openCostInBytes=262144"
export SPARK_GRAFT_RUNS=1
export SPARK_GRAFT_ONLY="x2a,x2b,x2c2,x2f,x23b,x28,x41,x52,x54,x56,x58,x59,x5o,x5p,x53,x55,x51,x11,x50"
for p in sfc5k sf1 sf10; do
  echo "=== heavy48 $p $(date +%H:%M:%S)" >> target/probe_chain.log
  SPARK_GRAFT_SF_DIR=target/$p sbt -batch "runMain graft.Bench" \
    > target/probe4_$p.log 2>&1
  cp BENCH_FULL.json target/probe4_$p.json
done
echo "HEAVY48_DONE $(date +%H:%M:%S)" >> target/probe_chain.log
