#!/usr/bin/env bash
# Round-14 probe chain — the r13 verdict's open scale items:
#   1. (verdict #1, top) Bound the 5M-doc candidate-GENERATION spill:
#      r13's vg16 notch moved heap mortality 2/5 -> 1/5 but spill_disk
#      stayed ~57.5G on every 5M face because the spill lives in the
#      band self-join passes, not the verify tail. The generation-side
#      notch is the same shape that already worked twice: more, smaller
#      sequential band-slice passes — bandGroups 8 -> 16. Both sf40 and
#      sf100 run bg16/vg16 so the decade ratio compares like with like,
#      and sf40 doubles as the bg8->bg16 overhead measurement against
#      r13's bg8/vg16 records. Heavy sf100 faces get up to 3 attempts
#      with per-attempt outcome ANNOTATED INTO THE RECORD
#      (attempts/attempts_failed/attempts_oom) — the judge asked for the
#      OOM count in the record, not the chain log.
#   2. (verdict #6) Prove the streaming LSH ingestion face at a scale
#      decade: ScaleProbe stream_lsh (new this round) replays the 20%
#      arrival split as file-source waves against the persisted,
#      budget-capped band store of the other 80% — wall, micro-batch
#      count, emitted pairs, and max dedup-state rows/bytes in the
#      record. sf10 is the judge's named 500k point; sf40 gives the
#      stream face its own decade step.
# Protocol v4 carried over from r13 unchanged: df preflight with a
# per-face budget, dedicated scratch wiped between faces, zstd shuffle
# codec, staged non-clobbering record extraction, idempotent relaunch,
# cpu-calib gate (2x median, retry-once-else-dirty) + io gate for
# spill-bound records, arithmetic GO/NO-GO for heavy sf100 faces.
set -u
cd /root/repo
mkdir -p target probes/r14
LOG=target/probe14_chain.log
SCRATCH=/root/repo/target/scratch
CALIBS=target/probe14_calibs.txt
CALIBS_IO=target/probe14_calibs_io.txt
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

echo "=== probe_r14 start $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG

# fixtures survive from earlier rounds; regenerate only if missing
for f in sf10:500000 sf40:2000000 sf100:5000000; do
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

attempt_face() { # name op dir bg vg
  local name=$1 op=$2 dir=$3 bg=$4 vg=$5
  rm -rf "$SCRATCH"; mkdir -p "$SCRATCH"
  local envx=()
  [ -n "$bg" ] && envx+=(SPARK_GRAFT_BAND_GROUPS=$bg)
  [ -n "$vg" ] && envx+=(SPARK_GRAFT_VERIFY_GROUPS=$vg)
  env "${envx[@]}" \
    JAVA_TOOL_OPTIONS="-Dspark.sql.files.maxPartitionBytes=2097152 -Dspark.sql.files.openCostInBytes=262144 -Dspark.local.dir=$SCRATCH -Dspark.io.compression.codec=zstd" \
    sbt -batch "runMain graft.ScaleProbe $op $dir" \
    > target/$name.log 2>&1
  local rc=$?
  # staged extraction: a FAILED attempt must never clobber an earlier
  # attempt's valid record (an r12 chain lesson)
  grep '^{"op"' target/$name.log | tail -1 > target/$name.json.new
  rm -rf "$SCRATCH"
  if [ -s target/$name.json.new ]; then
    mv target/$name.json.new target/$name.json
  else
    rm -f target/$name.json.new
    echo "FAILED $name rc=$rc $(date +%H:%M:%S); log tail:" >> $LOG
    tail -5 target/$name.log >> $LOG
    return 1
  fi
}

# arithmetic GO/NO-GO for a heavy sf100 *_budget face: project live
# scratch from this chain's own sf40 bg16/vg16 byte rate, the
# diag-measured candidate-volume ratio (r12 sf100 diag / r11 sf40 diag),
# and the LARGER slice divisor (generation now runs 16 band slices, the
# verify 16 candidate slices — live footprint is bounded by the bigger
# of the per-slice shares, i.e. still /16), with a 2x safety factor.
sf100_go() { # anchor_record
  local anchor=$1
  python3 - "$anchor" probes/r12/probe12_diag_minhash_sf100.json probes/r11/probe11_diag_minhash_sf40.json <<'EOF'
import json, subprocess, sys
anchor = json.load(open(sys.argv[1]))
d100 = json.load(open(sys.argv[2]))["diag"]
d40 = json.load(open(sys.argv[3]))["diag"]
budget100 = 32 * 5_000_000
curve = {c: d100.get(f"cand_pairs_c{c}", d100["cand_pairs"] if c == 64 else 0)
         for c in (4, 8, 16, 32, 64)}
vol100 = max((v for v in curve.values() if v <= budget100), default=curve[4])
cap100 = max((c for c, v in curve.items() if v <= budget100), default="<4")
vol40 = d40["cand_pairs_c8"]
bytes40 = (anchor["shuffle_write_gb"] + anchor["spill_disk_gb"])
proj_total = bytes40 * vol100 / vol40
vg = 16
proj_live = proj_total / vg * 2  # 2x safety
avail = int(subprocess.check_output(
    ["df", "-BG", "--output=avail", "/root/repo"]).split()[-1].rstrip(b"G"))
go = proj_live < avail - 10
print(f"sf100 preflight: grid cap~{cap100} vol={vol100/1e6:.1f}M pairs "
      f"(budget {budget100/1e6:.0f}M); anchor sf40 bg16/vg16 {bytes40:.1f}G at "
      f"{vol40/1e6:.1f}M pairs; projected total {proj_total:.1f}G, "
      f"live ~{proj_live:.1f}G (slices={vg}, 2x safety) vs {avail}G avail "
      f"-> {'GO' if go else 'NO-GO'}")
sys.exit(0 if go else 1)
EOF
}

# faces: name:op:tag:need_gb:band_groups:verify_groups:max_attempts —
# stream sf10 first (the named ask, cheap — banked early), then the
# sf40 bg16 anchors (overhead measurement + preflight anchors), then
# sf100 heavy with 3 attempts each (clusters BEFORE minhash: if disk or
# time dies, the composed face is banked), stream sf40 last (optional
# decade step; nothing downstream depends on it)
FACES="
stream_lsh:stream_lsh:sf10:40:::1
minhash_budget_bg16vg16:minhash_budget:sf40:70:16:16:1
clusters_budget_bg16vg16:clusters_budget:sf40:70:16:16:1
clusters_budget_bg16vg16:clusters_budget:sf100:70:16:16:3
minhash_budget_bg16vg16:minhash_budget:sf100:70:16:16:3
stream_lsh:stream_lsh:sf40:50:::1
"

for face in $FACES; do
  fname=$(echo "$face" | cut -d: -f1)
  op=$(echo "$face" | cut -d: -f2)
  tag=$(echo "$face" | cut -d: -f3)
  need=$(echo "$face" | cut -d: -f4)
  bg=$(echo "$face" | cut -d: -f5)
  vg=$(echo "$face" | cut -d: -f6)
  maxa=$(echo "$face" | cut -d: -f7)
  dir=target/$tag
  name=probe14_${fname}_$tag
  if [ -s probes/r14/$name.json ]; then
    echo "SKIP $name (already recorded)" >> $LOG
    continue
  fi
  # heavy sf100 budget faces pass the arithmetic gate first; stream
  # faces are exempt (store build is linear, the df preflight covers it)
  if [ "$tag" = sf100 ] && [ "$op" != stream_lsh ]; then
    anchor=probes/r14/probe14_${fname}_sf40.json
    if [ ! -s "$anchor" ] || [ ! -s probes/r12/probe12_diag_minhash_sf100.json ]; then
      echo "SKIP $name: missing anchor/diag for the preflight arithmetic" >> $LOG
      continue
    fi
    if verdict=$(sf100_go "$anchor"); then
      echo "PREFLIGHT $name: $verdict" >> $LOG
    else
      echo "PREFLIGHT-NOGO $name: $verdict" >> $LOG
      continue
    fi
  fi
  free=$(avail_gb)
  if [ "$free" -lt "$need" ]; then
    echo "FAILED-PREFLIGHT $name: ${free}G free < ${need}G budget $(date +%H:%M:%S)" >> $LOG
    continue
  fi
  echo "=== $name $(date +%H:%M:%S) avail=${free}G bg=${bg:-none} vg=${vg:-none} maxa=$maxa" >> $LOG
  # attempt loop (r14: heavy faces get maxa attempts, each failure
  # classified OOM-or-not so mortality lands in the record itself)
  ok=0; failed=0; ooms=0; attempts=0
  while [ "$attempts" -lt "$maxa" ]; do
    attempts=$((attempts + 1))
    if attempt_face "$name" "$op" "$dir" "$bg" "$vg"; then ok=1; break; fi
    failed=$((failed + 1))
    if grep -q 'OutOfMemoryError' target/$name.log; then
      ooms=$((ooms + 1))
      echo "ATTEMPT-OOM $name attempt=$attempts $(date +%H:%M:%S)" >> $LOG
    else
      echo "ATTEMPT-FAIL $name attempt=$attempts (non-OOM) $(date +%H:%M:%S)" >> $LOG
    fi
  done
  [ "$ok" = 1 ] || continue
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
  dirty=$(check_dirty)
  if [ "$dirty" = 1 ]; then
    echo "DIRTY $name calib=$(field_of target/$name.json calib) io=$(field_of target/$name.json calib_io) spill=$(field_of target/$name.json spill_disk_gb) — retrying once $(date +%H:%M:%S)" >> $LOG
    attempts=$((attempts + 1))
    attempt_face "$name" "$op" "$dir" "$bg" "$vg" && dirty=$(check_dirty)
  fi
  if [ "$dirty" = 1 ]; then
    mark_dirty target/$name.json
    echo "DIRTY-KEPT $name (tagged, excluded from median pools)" >> $LOG
  else
    field_of target/$name.json calib >> "$CALIBS"
    field_of target/$name.json calib_io >> "$CALIBS_IO"
  fi
  annotate_attempts target/$name.json "$attempts" "$failed" "$ooms"
  cp target/$name.json probes/r14/
  echo "OK $name $(cat target/$name.json)" >> $LOG
done

unset SPARK_GRAFT_RUNS SPARK_DRIVER_MEM
echo "PROBE_R14_DONE $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG
