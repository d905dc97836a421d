#!/usr/bin/env bash
# Round-11 probe chain — land the third scale decade (2M docs, sf40)
# for ALL FOUR capped-LSH faces, under protocol v3:
#
#   v2 carried over: df preflight with a per-face budget, dedicated
#   scratch dir (spark.local.dir) wiped between faces, zstd shuffle
#   codec, non-empty-record guard, idempotent relaunch.
#
#   NEW in v3 (r10 verdict items 1 + 3):
#   a. The minhash/clusters faces run BAND-GROUPED
#      (SPARK_GRAFT_BAND_GROUPS=8): the candidate self-join executes as
#      8 sequential band-slice passes with per-pass checkpoint +
#      GC-released shuffle files, bounding LIVE scratch at ~1/8 of the
#      monolithic job that exhausted 79 G twice (lz4 then zstd). Both
#      scale points of a face run grouped, so step ratios compare like
#      with like.
#   b. CALIB GATE: a face whose cpu calib exceeds 2x the chain's median
#      of accepted calibs is re-run once (dirty window — the r10 chain
#      kept a calib-7.44 record as the clean face's official anchor);
#      if the retry is still dirty the record is tagged "dirty": true
#      and its calib is NOT added to the median pool. Step ratios must
#      never be computed from a dirty anchor.
#   c. Records now carry shuffle/spill byte counters and the diag_*
#      faces carry exact candidate volumes — the evidence that
#      distinguishes a spill-regime transition from candidate blowup
#      (r10 verdict item 2).
set -u
cd /root/repo
mkdir -p target probes/r11
LOG=target/probe11_chain.log
SCRATCH=/root/repo/target/scratch
CALIBS=target/probe11_calibs.txt
: > "$CALIBS"

avail_gb() { df -BG --output=avail /root/repo | tail -1 | tr -dc 0-9; }

calib_of() {
  python3 -c "import json,sys; print(json.load(open(sys.argv[1]))['calib'])" "$1"
}

# median of accepted (clean) calibs so far; empty when none
chain_median() {
  [ -s "$CALIBS" ] || { echo ""; return; }
  sort -g "$CALIBS" | awk '{a[NR]=$1} END {
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

echo "=== probe_r11 start $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG

# fixtures survive from r10 (target/sf10 = 500k docs, target/sf40 = 2M)
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

# one face attempt; returns 0 when a record landed in target/$name.json
attempt_face() { # name op dir bg
  local name=$1 op=$2 dir=$3 bg=$4
  rm -rf "$SCRATCH"; mkdir -p "$SCRATCH"
  local envbg=()
  [ -n "$bg" ] && envbg=(SPARK_GRAFT_BAND_GROUPS=$bg)
  env "${envbg[@]}" \
    JAVA_TOOL_OPTIONS="-Dspark.sql.files.maxPartitionBytes=2097152 -Dspark.sql.files.openCostInBytes=262144 -Dspark.local.dir=$SCRATCH -Dspark.io.compression.codec=zstd" \
    sbt -batch "runMain graft.ScaleProbe $op $dir" \
    > target/$name.log 2>&1
  local rc=$?
  grep '^{"op"' target/$name.log | tail -1 > target/$name.json
  rm -rf "$SCRATCH"
  [ -s target/$name.json ] || {
    echo "FAILED $name rc=$rc $(date +%H:%M:%S); log tail:" >> $LOG
    tail -5 target/$name.log >> $LOG
    return 1
  }
}

# faces: op:tag:need_gb:band_groups. History of this list within r11:
#   pass 1 ran minhash_capped_sf40 (fixed cap 64, band-grouped) first —
#   it survived candidate GENERATION (scratch ≤21 G through the passes;
#   the band-group split works) and then died in the verify tail.
#   pass 2 ran the diag faces: capped candidate volume grows 10.3x per
#   4x docs at FIXED cap 64 (minhash 15.9M→163.8M; incremental
#   5.6M→57.3M) — the fixed cap is itself the super-linear term, and
#   164M candidates x ~2KB shingle sets cannot verify inside this box.
#   pass 3 (this list): the heavy faces run BUDGET-CALIBRATED
#   (minhash_budget/clusters_budget: cap = calibrateMaxBucket at 32
#   pairs/doc — reproduces cap~64 at the 500k anchor, tightens at 2M),
#   which is the production rule the fixed constant should have been.
#   The cap-64 sf10 records stay as the fixed-cap baseline points.
FACES="
diag_minhash:sf10:25:
diag_minhash:sf40:25:
diag_incremental:sf10:25:
diag_incremental:sf40:25:
minhash_budget:sf10:60:8
minhash_budget:sf40:60:8
clusters_budget:sf10:60:8
clusters_budget:sf40:60:8
incremental_capped:sf10:60:
incremental_capped:sf40:60:
clean_capped:sf10:70:
clean_capped:sf40:70:
incremental_budget:sf10:60:
incremental_budget:sf40:60:
clean_budget:sf10:70:
clean_budget:sf40:70:
"

for face in $FACES; do
  op=$(echo "$face" | cut -d: -f1)
  tag=$(echo "$face" | cut -d: -f2)
  need=$(echo "$face" | cut -d: -f3)
  bg=$(echo "$face" | cut -d: -f4)
  dir=target/$tag
  name=probe11_${op}_$tag
  if [ -s probes/r11/$name.json ]; then
    echo "SKIP $name (already recorded)" >> $LOG
    continue
  fi
  free=$(avail_gb)
  if [ "$free" -lt "$need" ]; then
    echo "FAILED-PREFLIGHT $name: ${free}G free < ${need}G budget $(date +%H:%M:%S)" >> $LOG
    continue
  fi
  echo "=== $name $(date +%H:%M:%S) avail=${free}G bg=${bg:-none}" >> $LOG
  attempt_face "$name" "$op" "$dir" "$bg" || continue
  # calib gate (v3): retry ONCE on a dirty window, else tag the record
  calib=$(calib_of target/$name.json)
  med=$(chain_median)
  dirty=0
  if [ -n "$med" ]; then
    dirty=$(python3 -c "print(1 if $calib > 2 * $med else 0)")
  fi
  if [ "$dirty" = 1 ]; then
    echo "DIRTY $name calib=$calib median=$med — retrying once $(date +%H:%M:%S)" >> $LOG
    if attempt_face "$name" "$op" "$dir" "$bg"; then
      calib=$(calib_of target/$name.json)
      dirty=$(python3 -c "print(1 if $calib > 2 * $med else 0)")
    fi
  fi
  if [ "$dirty" = 1 ]; then
    mark_dirty target/$name.json
    echo "DIRTY-KEPT $name calib=$calib median=$med (tagged, excluded from median pool)" >> $LOG
  else
    echo "$calib" >> "$CALIBS"
  fi
  cp target/$name.json probes/r11/
  echo "OK $name $(cat target/$name.json)" >> $LOG
done

unset SPARK_GRAFT_RUNS SPARK_DRIVER_MEM
echo "PROBE_R11_DONE $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG
