#!/usr/bin/env bash
# Round-16 probe chain — the r15 verdict's measured-scale items:
#   1. (verdict #1, top) Price the 10M-doc recall decade: recall_sampled
#      at sf200 (10M docs) runs FIRST — twice clock-refused in r14/r15,
#      now scheduled before everything else. It runs on a FROZEN
#      classpath (tools/java_probe.sh, snapshot of the r15 HEAD classes)
#      so this round's code work can compile/test in parallel without
#      racing sbt on target/scala-2.13/classes. Budget grid 48,64,105,160
#      puts each table budget's own calibrated cap in the caps grid, so
#      the 10M measuredRecallTable row reads straight off the record.
#      NOTE: face-1 wall-clock may carry CPU contention from concurrent
#      sbt test runs — the face's NUMBERS are the recall curve (exact
#      counts, contention-independent); "sec" is stamped contended=1.
#   2. (verdict #3) RocksDB state-store A/B on the stream diet face at
#      sf10: one conf (spark.sql.streaming.stateStore.providerClass) vs
#      r15's HDFS sf10 record (probes/r15/probe15_stream_lsh_diet_sf10).
#   3. (verdict #6) stream diet at sf40 with eviction live, HDFS default
#      (comparable against r14's non-diet sf40 record: 12.3 GB state).
#   4. optional sf40 RocksDB face if the clock still allows.
# Faces 2+ run via sbt AFTER target/r16_code_ready appears (the
# streaming newTexts-dedup fix + state-store diag stamp land first);
# if the marker never appears they proceed on whatever compiles.
# Protocol v4 carried from r15 (dirty-retry, attempt annotation,
# refusal log, GC-mortality flags).
set -u
cd /root/repo
mkdir -p target probes/r16
LOG=target/probe16_chain.log
SCRATCH=/root/repo/target/scratch
CALIBS=target/probe16_calibs.txt
CALIBS_IO=target/probe16_calibs_io.txt
: > "$CALIBS"
: > "$CALIBS_IO"

avail_gb() { df -BG --output=avail /root/repo | tail -1 | tr -dc 0-9; }

field_of() { # file field
  python3 -c "import json,sys; print(json.load(open(sys.argv[1])).get(sys.argv[2], 0))" "$1" "$2"
}

median_of() {
  [ -s "$1" ] || { echo ""; return; }
  sort -g "$1" | awk '{a[NR]=$1} END {
    if (NR % 2) print a[(NR+1)/2]; else print (a[NR/2]+a[NR/2+1])/2 }'
}

mark_dirty() {
  python3 - "$1" <<'EOF'
import json, sys
p = sys.argv[1]
r = json.load(open(p))
r["dirty"] = True
open(p, "w").write(json.dumps(r))
EOF
}

mark_contended() { # face 1 overlaps this round's sbt test runs — say so
  python3 - "$1" <<'EOF'
import json, sys
p = sys.argv[1]
r = json.load(open(p))
r["contended"] = True
open(p, "w").write(json.dumps(r))
EOF
}

annotate_attempts() { # file attempts failed oom
  python3 - "$1" "$2" "$3" "$4" <<'EOF'
import json, sys
p = sys.argv[1]
r = json.load(open(p))
r["attempts"] = int(sys.argv[2])
r["attempts_failed"] = int(sys.argv[3])
r["attempts_oom"] = int(sys.argv[4])
open(p, "w").write(json.dumps(r))
EOF
}

refuse() { # face reason
  echo "REFUSED $1: $2 $(date +%H:%M:%S)" >> $LOG
  echo "$(date -u +%FT%TZ) $1: $2" >> probes/r16/refusals.log
}

time_left_min() {
  local dl=${SPARK_GRAFT_DEADLINE_EPOCH:-0}
  if [ "$dl" = 0 ]; then echo 100000; else
    echo $(( (dl - $(date +%s)) / 60 ))
  fi
}

echo "=== probe_r16 start $(date +%H:%M:%S) avail=$(avail_gb)G deadline_in=$(time_left_min)min" >> $LOG

# sf200 gen was launched by the round opener; wait for it (cap 40 min)
waited=0
while [ $waited -lt 2400 ]; do
  grep -q "^wrote 10000000 docs" target/gen_sf200.log 2>/dev/null && break
  sleep 20; waited=$((waited + 20))
done
if ! grep -q "^wrote 10000000 docs" target/gen_sf200.log 2>/dev/null; then
  refuse probe16_recall_sampled_sf200 "sf200 fixture gen did not finish in 40 min"
fi
echo "=== gen sf200 ready $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG

export SPARK_GRAFT_RUNS=1
export SPARK_DRIVER_MEM=48g

attempt_face() { # name op dir bg vg storage extra_sysprops runner
  local name=$1 op=$2 dir=$3 bg=$4 vg=$5 storage=$6 sysprops=$7 runner=$8
  rm -rf "$SCRATCH"; mkdir -p "$SCRATCH"
  local envx=()
  [ -n "$bg" ] && envx+=(SPARK_GRAFT_BAND_GROUPS=$bg)
  [ -n "$vg" ] && envx+=(SPARK_GRAFT_VERIFY_GROUPS=$vg)
  [ -n "$storage" ] && envx+=(SPARK_GRAFT_CKPT_STORAGE=$storage)
  local rc
  if [ "$runner" = java ]; then
    # frozen-classpath path: java_probe.sh already carries the standard
    # probe sysprops + GC-mortality flags; extras ride JDK_JAVA_OPTIONS
    env "${envx[@]}" JDK_JAVA_OPTIONS="$sysprops" \
      SPARK_GRAFT_SCRATCH="$SCRATCH" \
      tools/java_probe.sh "$op" "$dir" > target/$name.log 2>&1
    rc=$?
  else
    env "${envx[@]}" \
      JAVA_TOOL_OPTIONS="-Dspark.sql.files.maxPartitionBytes=2097152 -Dspark.sql.files.openCostInBytes=262144 -Dspark.local.dir=$SCRATCH -Dspark.io.compression.codec=zstd -Dspark.network.timeout=600s -XX:+ExplicitGCInvokesConcurrent $sysprops" \
      sbt -batch "runMain graft.ScaleProbe $op $dir" \
      > target/$name.log 2>&1
    rc=$?
  fi
  grep '^{"op"' target/$name.log | tail -1 > target/$name.json.new
  rm -rf "$SCRATCH"
  if [ -s target/$name.json.new ]; then
    mv target/$name.json.new target/$name.json
  else
    rm -f target/$name.json.new
    echo "FAILED $name rc=$rc $(date +%H:%M:%S); log tail:" >> $LOG
    tail -5 target/$name.log >> $LOG
    cp target/$name.log "target/$name.fail$(date +%H%M%S).log" 2>/dev/null
    return 1
  fi
}

run_face() { # fname op tag need_gb bg vg storage maxa runner extra_sysprops [budget_grid] [contended]
  local fname=$1 op=$2 tag=$3 need=$4 bg=$5 vg=$6 storage=$7 maxa=$8
  local runner=$9 sysprops=${10} grid=${11:-} contended=${12:-}
  local dir=target/$tag
  local name=probe16_${fname}_$tag
  if [ -s probes/r16/$name.json ]; then
    echo "SKIP $name (already recorded)" >> $LOG
    return 0
  fi
  local free
  free=$(avail_gb)
  if [ "$free" -lt "$need" ]; then
    refuse "$name" "${free}G free < ${need}G budget"
    return 1
  fi
  [ -n "$grid" ] && export SPARK_GRAFT_BUDGET_GRID=$grid
  echo "=== $name $(date +%H:%M:%S) avail=${free}G bg=${bg:-none} vg=${vg:-none} storage=${storage:-default} runner=$runner maxa=$maxa" >> $LOG
  local ok=0 failed=0 ooms=0 attempts=0
  while [ "$attempts" -lt "$maxa" ]; do
    attempts=$((attempts + 1))
    if attempt_face "$name" "$op" "$dir" "$bg" "$vg" "$storage" "$sysprops" "$runner"; then ok=1; break; fi
    failed=$((failed + 1))
    if grep -q 'OutOfMemoryError' target/$name.log; then
      ooms=$((ooms + 1))
      echo "ATTEMPT-OOM $name attempt=$attempts $(date +%H:%M:%S)" >> $LOG
    else
      echo "ATTEMPT-FAIL $name attempt=$attempts (non-OOM) $(date +%H:%M:%S)" >> $LOG
    fi
  done
  unset SPARK_GRAFT_BUDGET_GRID
  [ "$ok" = 1 ] || { echo "DEAD $name attempts=$attempts failed=$failed ooms=$ooms $(date +%H:%M:%S)" >> $LOG; return 1; }
  check_dirty() {
    local calib calib_io spill med iomed
    calib=$(field_of target/$name.json calib)
    calib_io=$(field_of target/$name.json calib_io)
    spill=$(field_of target/$name.json spill_disk_gb)
    med=$(median_of "$CALIBS")
    iomed=$(median_of "$CALIBS_IO")
    python3 -c "
calib, calib_io, spill = $calib, $calib_io, $spill
med = ${med:-0} or None
iomed = ${iomed:-0} or None
dirty = (med is not None and calib > 2 * med) or \
        (spill > 1 and iomed is not None and calib_io > 2 * iomed)
print(1 if dirty else 0)"
  }
  local dirty
  dirty=$(check_dirty)
  if [ "$dirty" = 1 ]; then
    echo "DIRTY $name calib=$(field_of target/$name.json calib) io=$(field_of target/$name.json calib_io) spill=$(field_of target/$name.json spill_disk_gb) — retrying once $(date +%H:%M:%S)" >> $LOG
    attempts=$((attempts + 1))
    if attempt_face "$name" "$op" "$dir" "$bg" "$vg" "$storage" "$sysprops" "$runner"; then
      dirty=$(check_dirty)
    else
      failed=$((failed + 1))
      grep -q 'OutOfMemoryError' target/$name.log && ooms=$((ooms + 1))
      echo "DIRTY-RETRY-FAILED $name (earlier record kept) $(date +%H:%M:%S)" >> $LOG
    fi
  fi
  if [ "$dirty" = 1 ]; then
    mark_dirty target/$name.json
    echo "DIRTY-KEPT $name (tagged, excluded from median pools)" >> $LOG
  else
    field_of target/$name.json calib >> "$CALIBS"
    field_of target/$name.json calib_io >> "$CALIBS_IO"
  fi
  annotate_attempts target/$name.json "$attempts" "$failed" "$ooms"
  [ -n "$contended" ] && mark_contended target/$name.json
  cp target/$name.json probes/r16/
  echo "OK $name $(cat target/$name.json)" >> $LOG
  return 0
}

# --- face 1: the 10M-doc recall decade (verdict #1, ran FIRST).
# vg=32 + DISK_ONLY checkpoint cuts carry the r15 spill-kill evidence
# forward; the dirty-retry gate is OFF for this face (no median pool
# yet, and a 2h re-run would eat the stream faces) — maxa 2 covers
# mortality only.
# v2 (16:35): two measured kills rescoped this face. Attempt A (SER-
# default cuts via the probe lambdas, pre-6b49c16) OOMed at 62 min —
# AGGREGATE_OUT_OF_MEMORY under MemoryStore pressure (fail151202.log).
# Attempt B (DISK_ONLY cuts) filled the DISK at 62 min: the box has
# ~78G usable and the k=2 discovery's uncapped candidate volume at 10M
# docs exceeds it (fail162621.log, "No space left on device"). The 10M
# decade therefore prices with ONE discovery band (k=1 halves the
# ground-truth volume; recallAtCaps' Horvitz-Thompson reweighting is
# defined for any k — the record states k and the estimator) and
# vg=64 (more release points, smaller live verify slices). maxa=1:
# a third kill becomes a recorded refusal with three measured reasons.
if [ -f target/sf200/documents.parquet ]; then
  export SPARK_GRAFT_RECALL_BANDS=1
  run_face recall_sampled recall_sampled sf200 60 "" 64 DISK_ONLY 1 java "" "48,64,105,160" yes
  unset SPARK_GRAFT_RECALL_BANDS
else
  refuse probe16_recall_sampled_sf200 "no sf200 fixture"
fi

# --- faces 2+: wait for this round's code (streaming newTexts dedup,
# state-store diag stamp) before re-timing stream faces; cap 45 min
waited=0
while [ ! -f target/r16_code_ready ] && [ $waited -lt 2700 ]; do
  sleep 30; waited=$((waited + 30))
done
echo "=== code_ready=$([ -f target/r16_code_ready ] && echo yes || echo TIMEOUT) $(date +%H:%M:%S) left=$(time_left_min)min" >> $LOG

ROCKSDB="-Dspark.sql.streaming.stateStore.providerClass=org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

# --- face 2: RocksDB A/B at sf10 (verdict #3) vs r15's HDFS record
if [ "$(time_left_min)" -gt 30 ]; then
  run_face stream_lsh_rocksdb stream_lsh sf10 40 "" "" "" 1 sbt "$ROCKSDB"
else
  refuse probe16_stream_lsh_rocksdb_sf10 "only $(time_left_min) min left (needs ~25)"
fi

# --- face 3: sf40 diet with eviction live (verdict #6), HDFS default —
# directly comparable to r14's non-diet sf40 record (12.3 GB state)
if [ "$(time_left_min)" -gt 95 ]; then
  run_face stream_lsh_diet stream_lsh sf40 50 "" "" "" 1 sbt ""
else
  refuse probe16_stream_lsh_diet_sf40 "only $(time_left_min) min left (needs ~85)"
fi

# --- face 4 (optional): sf40 RocksDB if the clock still allows
if [ "$(time_left_min)" -gt 95 ]; then
  run_face stream_lsh_rocksdb stream_lsh sf40 50 "" "" "" 1 sbt "$ROCKSDB"
else
  refuse probe16_stream_lsh_rocksdb_sf40 "only $(time_left_min) min left (needs ~85)"
fi

unset SPARK_GRAFT_RUNS SPARK_DRIVER_MEM
echo "PROBE_R16_DONE $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG
