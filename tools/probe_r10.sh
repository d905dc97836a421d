#!/usr/bin/env bash
# Round-10 probe chain — the 5M-doc THIRD scale decade for the capped
# LSH family, re-run under a real disk protocol (r9 verdict item 1: all
# four sf100 faces died on "No space left on device", each crashed JVM
# leaking its /tmp block-manager dirs until the box starved — 44 GB of
# debris, four empty probe JSONs).
#
# Disk protocol (new in r10):
#   1. df PREFLIGHT before every face with a stated budget
#      (NEED_GB below) — a face that cannot fit is SKIPPED with an
#      explicit FAILED-PREFLIGHT log line, never started-and-crashed.
#   2. spark.local.dir pointed at a dedicated scratch dir
#      (target/scratch) that is rm -rf'd BETWEEN faces — a face that
#      hard-fails cannot leak its shuffle dirs into /tmp or starve the
#      next face.
#   3. Non-empty-record guard: a probe JSON is copied into probes/r10/
#      only if the record line actually exists ([ -s ]); a face that
#      produced no record logs FAILED with its tail instead of
#      committing a zero-byte artifact.
#
# Measurement protocol unchanged from probe_r9.sh: BenchProtocol
# (warmup + cpu/io calib), SPARK_GRAFT_RUNS=1, 2 MiB split scan
# partitions, shuffle.partitions=32. Each face's 500k anchor is re-run
# in the same chain so the 500k -> 5M step ratio is same-session.
set -u
cd /root/repo
mkdir -p target probes/r10
LOG=target/probe10_chain.log
SCRATCH=/root/repo/target/scratch
NEED_GB=70   # budget: the first 2M minhash attempt (killed externally
             # mid-run when its parent session died) had 63 G in scratch
             # on Job 19 — cumulative shuffle files across the signature
             # agg, band self-join, pair-verify joins, and final sort.
             # 70 G is the honest floor for the 2M faces; the box holds
             # ~79 G free after cleanup.

avail_gb() { df -BG --output=avail /root/repo | tail -1 | tr -dc 0-9; }

echo "=== probe_r10 start $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG

# Third scale point: 2M docs (sf40), NOT 5M. The 5M minhash face was
# attempted first under this protocol and died cleanly on disk: it
# consumed the box's entire 79 G of scratch in ~10 min of shuffle spill
# (FAILED probe10_minhash_capped_sf100 in target/probe10_chain.log;
# the 500k face spills ~8 G, so 10x needs ~80 G — just past this box).
# The r9 verdict pre-authorized exactly this fallback: "if it doesn't
# fit, run the decade at 2M docs and say so." 2M spills ~4x the 500k
# face (~30 G), inside the 40 G budget with headroom.
#
# PROTOCOL v2 (the first v1 pass at 2M ALSO died on disk — every sf40
# face exhausted the 79 G despite the preflight; cumulative shuffle
# files under lz4 exceed the box): all faces now run with
# spark.io.compression.codec=zstd — shuffle + spill bytes drop ~1.5-2x
# vs lz4 on this text-heavy data, the same lever a shuffle-bound LSH
# job pulls on a real cluster. The sf10 anchors are RE-RUN under zstd
# (their v1/lz4 records are deleted below) so every 500k→2M step ratio
# compares like with like; ScaleProbe records carry a "codec" field so
# a record can never misstate its regime.
# (idempotency-safe: only v1 records — no "codec" field — are swept,
# so a relaunch after a mid-chain death keeps completed v2 faces)
for f in probes/r10/probe10_*_sf*.json; do
  [ -f "$f" ] && ! grep -q '"codec"' "$f" && rm -f "$f"
done
for f in sf10:500000 sf40:2000000; do
  tag=${f%%:*}; n=${f#*:}
  if [ ! -f target/$tag/documents.parquet ]; then
    echo "=== gen $tag ($n docs) $(date +%H:%M:%S)" >> $LOG
    python3 tools/gen_fixtures.py $n target/$tag >> $LOG 2>&1 \
      || { echo "FAILED gen $tag" >> $LOG; exit 1; }
  fi
done
echo "=== gen done $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG

export SPARK_GRAFT_RUNS=1
export SPARK_DRIVER_MEM=48g

for op in minhash_capped clusters_capped clean_capped incremental_capped; do
  for p in sf10:target/sf10 sf40:target/sf40; do
    tag=${p%%:*}; dir=${p#*:}
    name=probe10_${op}_$tag
    # idempotent restart: a face already recorded this round is done
    if [ -s probes/r10/$name.json ]; then
      echo "SKIP $name (already recorded)" >> $LOG
      continue
    fi
    # (1) preflight: refuse to start a face the disk cannot hold
    free=$(avail_gb)
    if [ "$free" -lt "$NEED_GB" ]; then
      echo "FAILED-PREFLIGHT $name: ${free}G free < ${NEED_GB}G budget $(date +%H:%M:%S)" >> $LOG
      continue
    fi
    # (2) dedicated scratch, cleaned between faces
    rm -rf "$SCRATCH"; mkdir -p "$SCRATCH"
    echo "=== $name $(date +%H:%M:%S) avail=${free}G" >> $LOG
    JAVA_TOOL_OPTIONS="-Dspark.sql.files.maxPartitionBytes=2097152 -Dspark.sql.files.openCostInBytes=262144 -Dspark.local.dir=$SCRATCH -Dspark.io.compression.codec=zstd" \
      sbt -batch "runMain graft.ScaleProbe $op $dir" \
      > target/$name.log 2>&1
    rc=$?
    grep '^{"op"' target/$name.log | tail -1 > target/$name.json
    # (3) only a real record becomes an artifact
    if [ -s target/$name.json ]; then
      cp target/$name.json probes/r10/
      echo "OK $name $(cat target/$name.json)" >> $LOG
    else
      echo "FAILED $name rc=$rc $(date +%H:%M:%S); log tail:" >> $LOG
      tail -5 target/$name.log >> $LOG
    fi
    rm -rf "$SCRATCH"
  done
done

unset SPARK_GRAFT_RUNS SPARK_DRIVER_MEM
echo "PROBE_R10_DONE $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG
