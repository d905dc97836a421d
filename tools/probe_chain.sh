#!/usr/bin/env bash
# Scale-probe chain (round 7): heavy-operator subset at 5k / 50k / 500k
# docs, then the FULL 139-query surface at sf0.1 and sf1(full tables).
# Single-run protocol (SPARK_GRAFT_RUNS=1) at every point — ratios are
# protocol-consistent; min-of-2 would double an hours-long sf10 sweep.
# Small scan partitions simulate a real cluster's pre-split inputs
# (a locally generated parquet file is otherwise one scan partition).
set -u
cd /root/repo
export JAVA_TOOL_OPTIONS="-Dspark.sql.files.maxPartitionBytes=2097152 -Dspark.sql.files.openCostInBytes=262144"
export SPARK_GRAFT_RUNS=1
HEAVY="x2a,x2b,x2c2,x2f,x23b,x28,x41,x52,x54,x56,x58,x59,x5o,x5p,x53,x55,x51,x11,x50"

run() { # name sfdir only
  local name=$1 sfdir=$2 only=$3
  echo "=== $name ($sfdir) $(date +%H:%M:%S)" >> target/probe_chain.log
  if [ -n "$only" ]; then export SPARK_GRAFT_ONLY=$only; else unset SPARK_GRAFT_ONLY; fi
  SPARK_GRAFT_SF_DIR=$sfdir \
    sbt -batch "runMain graft.Bench" > target/probe3_$name.log 2>&1
  cp BENCH_FULL.json target/probe3_$name.json
}

run sfc5k  target/sfc5k   "$HEAVY"
run sf1    target/sf1     "$HEAVY"
run sf10   target/sf10    "$HEAVY"
run full01 /root/testdata/sf0.1 ""
run full1  target/sf1full ""
# leave the tracked BENCH_FULL.json in its canonical full-surface
# sf0.01 state (no partition-size override, default min-of-2)
unset SPARK_GRAFT_ONLY JAVA_TOOL_OPTIONS SPARK_GRAFT_RUNS
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  sbt -batch "runMain graft.Bench" > target/probe3_canon001.log 2>&1
echo "PROBES_DONE_V5 $(date +%H:%M:%S)" >> target/probe_chain.log
