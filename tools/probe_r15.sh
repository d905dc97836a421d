#!/usr/bin/env bash
# Round-15 probe chain — the r14 verdict's measured-scale items:
#   1. (verdict #1, top) Kill the ATTRIBUTED 5M-doc spill at its site:
#      r14 attributed 54.7 of 57.4G sf100 spill_disk to the checkpoint-
#      BUILD stages at TextDedup checkpointTracked (localCheckpoint's
#      deserialized MEMORY_AND_DISK default hoarding unified memory the
#      same stages' sorts needed). The lever: checkpoint cuts now
#      persist MEMORY_AND_DISK_SER by default
#      (spark.graft.checkpoint.storage). Both sf100 budget faces re-run
#      bg16/vg16 under the new default — spill at that callsite and
#      heavy-attempt mortality are the record; if SER still spills
#      >20G, a DISK_ONLY attempt A/Bs the stronger level.
#   2. (verdict #3) Streaming LSH state diet: stream_lsh now passes the
#      wave store as newTexts, so the stateful pair dedup carries no
#      document text (r14 measured 12.3GB state / 25.5M rows at sf40).
#      Re-probe sf40; state_bytes_max is the number. Wave timestamps
#      now step 5 min (> watermark eviction actually exercised — r14
#      advice; state_rows_max is now a steady-state bound, noted in
#      BENCHNOTES, so the r14 number is its no-eviction upper bound).
#   3. (verdict #4) Price the 10M-doc decade: gen target/sf200, then
#      recall_sampled with SPARK_GRAFT_BUDGET_GRID=48,105 so the record
#      carries each table budget's own calibrated cap. Gated on disk
#      AND a wall-clock guard (SPARK_GRAFT_DEADLINE_EPOCH, set by the
#      launcher): if the gate refuses, the REFUSAL ITSELF is recorded
#      (probes/r15/refusals.log) — the honest alternative the verdict
#      names.
# Protocol v4 carried from r14; one fix (r14 advice): a failed
# dirty-retry now bumps failed/ooms before annotate_attempts, so the
# record's mortality annotation counts that failure mode too.
set -u
cd /root/repo
mkdir -p target probes/r15
LOG=target/probe15_chain.log
SCRATCH=/root/repo/target/scratch
CALIBS=target/probe15_calibs.txt
CALIBS_IO=target/probe15_calibs_io.txt
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
  echo "$(date -u +%FT%TZ) $1: $2" >> probes/r15/refusals.log
}

echo "=== probe_r15 start $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG

for f in sf40:2000000 sf100:5000000; do
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

attempt_face() { # name op dir bg vg storage
  local name=$1 op=$2 dir=$3 bg=$4 vg=$5 storage=$6
  rm -rf "$SCRATCH"; mkdir -p "$SCRATCH"
  local envx=()
  [ -n "$bg" ] && envx+=(SPARK_GRAFT_BAND_GROUPS=$bg)
  [ -n "$vg" ] && envx+=(SPARK_GRAFT_VERIFY_GROUPS=$vg)
  [ -n "$storage" ] && envx+=(SPARK_GRAFT_CKPT_STORAGE=$storage)
  # r15 mortality root-cause (chain log 10:12): releaseShuffles()'s
  # System.gc() on the 48g heap ran a ~250s stop-the-world full GC, the
  # heartbeat thread starved past spark.network.timeout's 120s default,
  # HeartbeatReceiver removed local mode's ONLY executor, and every
  # cached checkpoint block "disappeared" mid-read (the SER faces' exit-
  # 56 "Block rdd_N does not exist" and the DISK face's heartbeat death
  # are the same event). Two harness-level fixes, zero code semantics:
  # ExplicitGCInvokesConcurrent turns the explicit GC into a concurrent
  # G1 cycle (reference processing still drives ContextCleaner), and a
  # 600s network timeout stops a single-box probe from beheading itself
  # over a pause a real cluster's driver would never take (the data
  # lives on executors there).
  env "${envx[@]}" \
    JAVA_TOOL_OPTIONS="-Dspark.sql.files.maxPartitionBytes=2097152 -Dspark.sql.files.openCostInBytes=262144 -Dspark.local.dir=$SCRATCH -Dspark.io.compression.codec=zstd -Dspark.network.timeout=600s -XX:+ExplicitGCInvokesConcurrent" \
    sbt -batch "runMain graft.ScaleProbe $op $dir" \
    > target/$name.log 2>&1
  local rc=$?
  grep '^{"op"' target/$name.log | tail -1 > target/$name.json.new
  rm -rf "$SCRATCH"
  if [ -s target/$name.json.new ]; then
    mv target/$name.json.new target/$name.json
  else
    rm -f target/$name.json.new
    echo "FAILED $name rc=$rc $(date +%H:%M:%S); log tail:" >> $LOG
    tail -5 target/$name.log >> $LOG
    # keep the failed attempt's full log — the retry overwrites
    # target/$name.log, and a failure whose only trace is 5 tail lines
    # cannot be diagnosed (this round's attempt-1 exit-56 lesson)
    cp target/$name.log "target/$name.fail$(date +%H%M%S).log" 2>/dev/null
    return 1
  fi
}

run_face() { # name op tag need_gb bg vg storage maxa [budget_grid]
  local fname=$1 op=$2 tag=$3 need=$4 bg=$5 vg=$6 storage=$7 maxa=$8 grid=${9:-}
  local dir=target/$tag
  local name=probe15_${fname}_$tag
  if [ -s probes/r15/$name.json ]; then
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
  echo "=== $name $(date +%H:%M:%S) avail=${free}G bg=${bg:-none} vg=${vg:-none} storage=${storage:-default} maxa=$maxa" >> $LOG
  local ok=0 failed=0 ooms=0 attempts=0
  while [ "$attempts" -lt "$maxa" ]; do
    attempts=$((attempts + 1))
    if attempt_face "$name" "$op" "$dir" "$bg" "$vg" "$storage"; then ok=1; break; fi
    failed=$((failed + 1))
    if grep -q 'OutOfMemoryError' target/$name.log; then
      ooms=$((ooms + 1))
      echo "ATTEMPT-OOM $name attempt=$attempts $(date +%H:%M:%S)" >> $LOG
    else
      echo "ATTEMPT-FAIL $name attempt=$attempts (non-OOM) $(date +%H:%M:%S)" >> $LOG
    fi
  done
  unset SPARK_GRAFT_BUDGET_GRID
  [ "$ok" = 1 ] || { annotate_attempts_log "$name" "$attempts" "$failed" "$ooms"; return 1; }
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
    if attempt_face "$name" "$op" "$dir" "$bg" "$vg" "$storage"; then
      dirty=$(check_dirty)
    else
      # r14 advice: a failed dirty-retry is a failed attempt — classify
      # it into the mortality annotation like any other
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
  cp target/$name.json probes/r15/
  echo "OK $name $(cat target/$name.json)" >> $LOG
  return 0
}

annotate_attempts_log() { # name attempts failed ooms — face never succeeded
  echo "DEAD $1 attempts=$2 failed=$3 ooms=$4 $(date +%H:%M:%S)" >> $LOG
}

# wall-clock guard for the optional tail faces: the launcher sets
# SPARK_GRAFT_DEADLINE_EPOCH to when the box must be free again for the
# round-close bench; a face whose expected cost would blow it refuses
# (recorded), it doesn't run long
time_left_min() {
  local dl=${SPARK_GRAFT_DEADLINE_EPOCH:-0}
  if [ "$dl" = 0 ]; then echo 100000; else
    echo $(( (dl - $(date +%s)) / 60 ))
  fi
}

# --- v3 schedule (10:00): face-1 evidence is IN — the stray v1 SER
# attempt 3 survived and was harvested (probes/r15/
# probe15_minhash_budget_ser_sf100.json): spill_disk 57.4G -> 2.77G,
# the checkpointTracked callsite's 54.7G fully gone, wall par with
# r14 — but SER mortality was 2-of-3 (non-OOM "Block rdd_N does not
# exist" under a hidden FetchFailedException, a NEW signature). So the
# composed face runs at DISK_ONLY: one record answers both "is the
# spill kill level-generic" and "does removing the storage-memory
# interaction remove the new mortality" — and decides the code default.
run_face clusters_budget_disk clusters_budget sf100 70 16 16 DISK_ONLY 2

# --- stream LSH state diet: sf40 if the clock allows, else the sf10
# fallback (the r14 sf10 point was 2.90GB state — the diet's shrink is
# measurable at either decade; sf40 is the verdict's named re-probe)
if [ "$(time_left_min)" -gt 95 ]; then
  run_face stream_lsh_diet stream_lsh sf40 50 "" "" "" 1
elif [ "$(time_left_min)" -gt 30 ]; then
  refuse probe15_stream_lsh_diet_sf40 "only $(time_left_min) min left (needs ~85); falling back to sf10"
  run_face stream_lsh_diet stream_lsh sf10 40 "" "" "" 1
else
  refuse probe15_stream_lsh_diet_sf40 "only $(time_left_min) min left — no stream decade fits"
fi

# --- the 10M-doc recall decade, gated (expected to refuse this round)
if [ "$(time_left_min)" -gt 150 ] && [ "$(avail_gb)" -gt 65 ]; then
  if [ ! -f target/sf200/documents.parquet ]; then
    echo "=== gen sf200 (10000000 docs) $(date +%H:%M:%S)" >> $LOG
    python3 tools/gen_fixtures.py 10000000 target/sf200 >> $LOG 2>&1 \
      || refuse probe15_recall_sampled_sf200 "fixture gen failed"
  fi
  if [ -f target/sf200/documents.parquet ]; then
    run_face recall_sampled recall_sampled sf200 65 "" 32 DISK_ONLY 1 "48,105"
  fi
else
  refuse probe15_recall_sampled_sf200 "$(time_left_min) min left / $(avail_gb)G free — needs >150 min and >65G; the 10M decade stays unpriced (budgetForRecall keeps refusing past 5M)"
fi

unset SPARK_GRAFT_RUNS SPARK_DRIVER_MEM
echo "PROBE_R15_DONE $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG
