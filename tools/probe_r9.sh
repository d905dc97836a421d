#!/usr/bin/env bash
# Round-9 probe chain (r8 verdict items 3 + 4):
#  (a) a THIRD scale decade for the capped LSH family — 5M docs
#      (target/sf100), where the uncapped path extrapolates to >6000 s
#      and is not worth running. Each face's 500k anchor is RE-RUN in
#      the same chain so the 500k -> 5M step ratio is same-session,
#      same-protocol (the probes now also emit calib_io; r8's committed
#      500k records predate that field);
#  (b) estimate_capped + estimate_store back-to-back in ONE session
#      window — r8's estimate_store 500k point landed on a fast-CPU/
#      slow-IO window and read as the family's worst step ratio while
#      BENCHNOTES claims the store face is the cheapest; a calib-equal
#      pair settles it.
# Protocol: BenchProtocol (warmup + cpu/io calib), SPARK_GRAFT_RUNS=1,
# split scan partitions (single-file fixtures parallelize like cluster
# inputs), shuffle.partitions=32 (the protocol constant — the 5M point
# deliberately exercises data volume past 32 partitions' comfort).
set -u
cd /root/repo
mkdir -p target probes/r9
LOG=target/probe8_chain.log
echo "=== probe_r9 start $(date +%H:%M:%S)" >> $LOG

# 5M-doc documents-only fixture (same generator marginals as sf10)
if [ ! -f target/sf100/documents.parquet ]; then
  echo "=== gen sf100 $(date +%H:%M:%S)" >> $LOG
  python3 tools/gen_fixtures.py 5000000 target/sf100 >> $LOG 2>&1
fi
echo "=== gen done $(date +%H:%M:%S)" >> $LOG

export JAVA_TOOL_OPTIONS="-Dspark.sql.files.maxPartitionBytes=2097152 -Dspark.sql.files.openCostInBytes=262144"
export SPARK_GRAFT_RUNS=1
export SPARK_DRIVER_MEM=48g

# (a) capped family: same-session 500k anchor + the 5M decade
for op in minhash_capped clusters_capped clean_capped incremental_capped; do
  for p in sf10:target/sf10 sf100:target/sf100; do
    tag=${p%%:*}; dir=${p#*:}
    echo "=== ${op}_$tag $(date +%H:%M:%S)" >> $LOG
    sbt -batch "runMain graft.ScaleProbe $op $dir" \
      > target/probe8_${op}_$tag.log 2>&1
    grep '^{"op"' target/probe8_${op}_$tag.log | tail -1 \
      > target/probe8_${op}_$tag.json
    cp target/probe8_${op}_$tag.json probes/r9/ 2>/dev/null
  done
done

# (b) the estimator pair, one window: capped (from text) vs store
for op in estimate_capped estimate_store; do
  echo "=== ${op}_sf10 $(date +%H:%M:%S)" >> $LOG
  sbt -batch "runMain graft.ScaleProbe $op target/sf10" \
    > target/probe8_${op}_sf10.log 2>&1
  grep '^{"op"' target/probe8_${op}_sf10.log | tail -1 \
    > target/probe8_${op}_sf10.json
  cp target/probe8_${op}_sf10.json probes/r9/ 2>/dev/null
done

unset JAVA_TOOL_OPTIONS SPARK_GRAFT_RUNS SPARK_DRIVER_MEM
echo "PROBE_R9_DONE $(date +%H:%M:%S)" >> $LOG
