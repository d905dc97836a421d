#!/usr/bin/env bash
# Round-8 probe chain, in verdict order:
#  (a) bench-cleanup A/B — the r7 1.56x uniform regression: a fixed
#      query subset at sf0.1, min-of-2, official protocol, under
#      SPARK_GRAFT_GC = async (r7 behavior) / blocking (new default) /
#      off (no gc at all);
#  (b) the capped LSH family (minhash/clusters/clean/waterfall, cap=64)
#      at 5k/50k/500k docs and constant-cell SemDeDup (kCells=n/500) at
#      2k/20k/200k vectors — the scale-parameterized faces written in r7
#      but never executed. r7 probe protocol: split scan partitions,
#      single run (ratios are protocol-consistent with probe4);
#  (c) x2g/x5a isolation probes at sf0.1 vs sf1full (r7 sweep outliers:
#      6.9x/4.1x inside the full sweep — corpus-linear ops should be
#      ~10x at 10x alone);
#  (d) the canonical full official bench at sf0.1 under the fixed
#      default, leaving BENCH_FULL.json in its documented state.
set -u
cd /root/repo
mkdir -p target
LOG=target/probe5_chain.log
echo "=== probe_r8 start $(date +%H:%M:%S)" >> $LOG

# (a) GC A/B — NOTE prefix semantics: SPARK_GRAFT_ONLY matches by
# name PREFIX, so "x1" also selects x10a..x19 — the committed A/B
# records (probes/r8/probe5_gc_*.json) therefore cover an 18-query
# subset spanning the worst regressors (x47, x9e, x12, x13), I/O-bound
# demos and stable cheap queries; NO partition override (the
# official-bench protocol)
for mode in async blocking off; do
  echo "=== gc_$mode $(date +%H:%M:%S)" >> $LOG
  SPARK_GRAFT_GC=$mode SPARK_GRAFT_ONLY=q01,q05,q10,x1,x5a,x9e,x47 \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.Bench" > target/probe5_gc_$mode.log 2>&1
  cp BENCH_FULL.json target/probe5_gc_$mode.json
done

# (b) capped scale sweeps — r7 probe protocol (split partitions, 1 run)
export JAVA_TOOL_OPTIONS="-Dspark.sql.files.maxPartitionBytes=2097152 -Dspark.sql.files.openCostInBytes=262144"
export SPARK_GRAFT_RUNS=1
for op in minhash_capped clusters_capped clean_capped waterfall_capped; do
  for p in sfc5k:target/sfc5k sf1:target/sf1 sf10:target/sf10; do
    tag=${p%%:*}; dir=${p#*:}
    echo "=== ${op}_$tag $(date +%H:%M:%S)" >> $LOG
    sbt -batch "runMain graft.ScaleProbe $op $dir" \
      > target/probe5_${op}_$tag.log 2>&1
    grep '^{"op"' target/probe5_${op}_$tag.log | tail -1 \
      > target/probe5_${op}_$tag.json
  done
done
for p in e2k:/root/testdata/sf0.1 e20k:target/semb1 e200k:target/semb10; do
  tag=${p%%:*}; dir=${p#*:}
  echo "=== semdedup_$tag $(date +%H:%M:%S)" >> $LOG
  sbt -batch "runMain graft.ScaleProbe semdedup_scaled $dir" \
    > target/probe5_semdedup_$tag.log 2>&1
  grep '^{"op"' target/probe5_semdedup_$tag.log | tail -1 \
    > target/probe5_semdedup_$tag.json
done

# (c) isolation probes — same protocol as the r7 full sweep those
# outlier ratios came from
for q in x2g x5a; do
  for p in sf01:/root/testdata/sf0.1 sf1full:target/sf1full; do
    tag=${p%%:*}; dir=${p#*:}
    echo "=== iso_${q}_$tag $(date +%H:%M:%S)" >> $LOG
    SPARK_GRAFT_ONLY=$q SPARK_GRAFT_SF_DIR=$dir \
      sbt -batch "runMain graft.Bench" > target/probe5_iso_${q}_$tag.log 2>&1
    cp BENCH_FULL.json target/probe5_iso_${q}_$tag.json
  done
done
unset JAVA_TOOL_OPTIONS SPARK_GRAFT_RUNS SPARK_GRAFT_ONLY

# (d) canonical full official bench at sf0.1, default (blocking) mode
echo "=== full01 $(date +%H:%M:%S)" >> $LOG
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" > target/probe5_full01.log 2>&1
echo "PROBE_R8_DONE $(date +%H:%M:%S)" >> $LOG
