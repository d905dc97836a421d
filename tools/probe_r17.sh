#!/usr/bin/env bash
# Round-17 probe chain — the r16 verdict's measured-scale items, in the
# verdict's own order:
#   1. (verdict #2) The twice-refused sf40 streaming face runs FIRST —
#      ONE run with the RocksDB provider covers both done-criteria:
#      (a) diet-eviction steady state at the next decade (state_rows_max
#      vs sf10's 3.87M — counts, contention-independent) and (b) the
#      RocksDB confirmation stamp at sf40 (state_store_rocksdb=1).
#      Runs on a FROZEN classpath (r16 HEAD classes) so this round's
#      code work compiles/tests in parallel; wall-clock is stamped
#      contended=1 (same caveat as r16 face 1 — the NUMBERS are counts).
#   2. (verdict #3) RocksDB is now the chain's streaming DEFAULT — the
#      r16 sf10 A/B confirmed it (identical pairs/rows, −83% state
#      memory, ×0.70 wall); records stamp the provider actually in
#      effect, so a mixed record cannot happen silently. The optional
#      tail face re-measures HDFS at sf40 for the A/B contrast.
#   3. (verdict #1, top) The sampled-pair-universe recall estimator:
#      recall_pairsample VALIDATES at sf100 (5M docs, S=4) against the
#      exact measured row (caps 5/6/8/16 → .993219/.998271/.999824/1.0,
#      r13 record) FIRST, then prices the 10M decade at sf200 (S=8).
#      Pair sampling (both endpoints md5-sampled, uniform 1/S²
#      inclusion) shrinks the GROUND-TRUTH verify volume itself —
#      29.64B uncapped pairs → ~463M at S=8 — which three r16 kills
#      proved no discovery-band config can do (probes/r16/refusals.log);
#      min_bn rides a map-side-combinable (band,key) histogram, not the
#      640M-row window that filled the disk in kill #3. These faces
#      need THIS round's code: they wait for target/r17_code_ready
#      (created after sbt test passes) and freeze their own classpath.
# Protocol v4 carried from r16 (dirty-retry, attempt annotation,
# refusal log, GC-mortality flags).
set -u
cd /root/repo
mkdir -p target probes/r17
LOG=target/probe17_chain.log
SCRATCH=/root/repo/target/scratch
CALIBS=target/probe17_calibs.txt
CALIBS_IO=target/probe17_calibs_io.txt
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

mark_contended() { # sbt/test JVMs shared the box's CPUs — say so
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
  echo "$(date -u +%FT%TZ) $1: $2" >> probes/r17/refusals.log
}

time_left_min() {
  local dl=${SPARK_GRAFT_DEADLINE_EPOCH:-0}
  if [ "$dl" = 0 ]; then echo 100000; else
    echo $(( (dl - $(date +%s)) / 60 ))
  fi
}

echo "=== probe_r17 start $(date +%H:%M:%S) avail=$(avail_gb)G deadline_in=$(time_left_min)min" >> $LOG

export SPARK_GRAFT_RUNS=1
export SPARK_DRIVER_MEM=48g

attempt_face() { # name op dir bg vg storage extra_sysprops frozen_dir
  local name=$1 op=$2 dir=$3 bg=$4 vg=$5 storage=$6 sysprops=$7 frozen=$8
  rm -rf "$SCRATCH"; mkdir -p "$SCRATCH"
  local envx=()
  [ -n "$bg" ] && envx+=(SPARK_GRAFT_BAND_GROUPS=$bg)
  [ -n "$vg" ] && envx+=(SPARK_GRAFT_VERIFY_GROUPS=$vg)
  [ -n "$storage" ] && envx+=(SPARK_GRAFT_CKPT_STORAGE=$storage)
  # frozen-classpath runner only this round: every face runs via plain
  # java (java_probe.sh carries the standard probe sysprops + the r15
  # GC-mortality flags); extras ride JDK_JAVA_OPTIONS
  env "${envx[@]}" JDK_JAVA_OPTIONS="$sysprops" \
    SPARK_GRAFT_SCRATCH="$SCRATCH" SPARK_GRAFT_FROZEN="$frozen" \
    tools/java_probe.sh "$op" "$dir" > target/$name.log 2>&1
  local rc=$?
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

run_face() { # fname op tag need_gb bg vg storage maxa frozen extra_sysprops [budget_grid] [contended]
  local fname=$1 op=$2 tag=$3 need=$4 bg=$5 vg=$6 storage=$7 maxa=$8
  local frozen=$9 sysprops=${10} grid=${11:-} contended=${12:-}
  local dir=target/$tag
  local name=probe17_${fname}_$tag
  if [ -s probes/r17/$name.json ]; then
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
  echo "=== $name $(date +%H:%M:%S) avail=${free}G bg=${bg:-none} vg=${vg:-none} storage=${storage:-default} frozen=$frozen maxa=$maxa" >> $LOG
  local ok=0 failed=0 ooms=0 attempts=0
  while [ "$attempts" -lt "$maxa" ]; do
    attempts=$((attempts + 1))
    if attempt_face "$name" "$op" "$dir" "$bg" "$vg" "$storage" "$sysprops" "$frozen"; then ok=1; break; fi
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
    if attempt_face "$name" "$op" "$dir" "$bg" "$vg" "$storage" "$sysprops" "$frozen"; then
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
  cp target/$name.json probes/r17/
  echo "OK $name $(cat target/$name.json)" >> $LOG
  return 0
}

ROCKSDB="-Dspark.sql.streaming.stateStore.providerClass=org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

# --- face 1: sf40 streaming diet under the NEW RocksDB default (verdict
# #2 + #3) — twice clock-refused (r15, r16), so it runs before anything
# else, on the r16-HEAD frozen classpath (streaming code is unchanged
# this round). maxa=1 + dirty-retry; done-criteria are counts
# (state_rows_max, pairs_out, the provider stamp), contention-safe.
if [ "$(time_left_min)" -gt 95 ]; then
  run_face stream_lsh_rocksdb stream_lsh sf40 50 "" "" "" 1 \
    target/r17_frozen/classes "$ROCKSDB" "" yes
else
  refuse probe17_stream_lsh_rocksdb_sf40 "only $(time_left_min) min left (needs ~85)"
fi

# --- faces 2+: the sampled-pair-universe estimator needs this round's
# code (TextDedup.lshSurvivalStatsSampled + the recall_pairsample op);
# wait for the tested-and-committed marker, then freeze that classpath
waited=0
while [ ! -f target/r17_code_ready ] && [ "$(time_left_min)" -gt 130 ]; do
  sleep 30; waited=$((waited + 30))
done
if [ -f target/r17_code_ready ]; then
  rm -rf target/r17_frozen2
  mkdir -p target/r17_frozen2
  cp -a target/scala-2.13/classes target/r17_frozen2/classes
  echo "=== code_ready, frozen2 snapshot taken $(date +%H:%M:%S) left=$(time_left_min)min" >> $LOG
else
  echo "=== code_ready TIMEOUT $(date +%H:%M:%S) left=$(time_left_min)min" >> $LOG
fi

# --- face 2: estimator VALIDATION at the 5M decade (sf100, S=4): the
# done-criterion is agreement with the exact measured row (r13: caps
# 5/6/8/16 → .993219/.998271/.999824/1.0) within the sample's binomial
# CI. Budget grid 48,105 puts the table budgets' own caps in the grid.
if [ -f target/r17_code_ready ] && [ "$(time_left_min)" -gt 135 ]; then
  export SPARK_GRAFT_SAMPLE_ONE_IN=4
  run_face recall_pairsample recall_pairsample sf100 40 "" 16 DISK_ONLY 1 \
    target/r17_frozen2/classes "" "48,105"
  unset SPARK_GRAFT_SAMPLE_ONE_IN
else
  refuse probe17_recall_pairsample_sf100 "code_ready=$([ -f target/r17_code_ready ] && echo yes || echo no), only $(time_left_min) min left (needs ~135 incl. the 10M face)"
fi

# --- face 3: the 10M decade (sf200, S=8): ~463M sampled ground-truth
# pairs (29.64B / 64) vs the three r16 kills' uncapped universe. Budget
# grid puts every candidate table budget's cap in the caps grid so the
# 10M measuredRecallTable row reads straight off the record.
if [ -f target/r17_code_ready ] && [ -f target/sf200/documents.parquet ] && [ "$(time_left_min)" -gt 80 ]; then
  export SPARK_GRAFT_SAMPLE_ONE_IN=8
  run_face recall_pairsample recall_pairsample sf200 60 "" 32 DISK_ONLY 1 \
    target/r17_frozen2/classes "" "48,64,105,160"
  unset SPARK_GRAFT_SAMPLE_ONE_IN
else
  refuse probe17_recall_pairsample_sf200 "code_ready=$([ -f target/r17_code_ready ] && echo yes || echo no), only $(time_left_min) min left (needs ~80)"
fi

# --- face 4 (optional): sf40 HDFS for the provider A/B at this decade
if [ "$(time_left_min)" -gt 95 ]; then
  run_face stream_lsh_hdfs stream_lsh sf40 50 "" "" "" 1 \
    target/r17_frozen/classes ""
else
  refuse probe17_stream_lsh_hdfs_sf40 "only $(time_left_min) min left (needs ~85)"
fi

unset SPARK_GRAFT_RUNS SPARK_DRIVER_MEM
echo "PROBE_R17_DONE $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG
