#!/usr/bin/env bash
# Round-12 probe chain — (1) MEASURE recall-vs-cap at both probe decades
# (the r11 verdict's job #1: the budget rule that delivered the third
# decade discards >92% of candidate pairs at its calibrated cap 5, and
# nothing measured what that costs in recall), and (2) attempt the
# FOURTH decade (5M docs, sf100) under the budget rule + the new
# verify-group split. Protocol v4:
#
#   v3 carried over: df preflight with a per-face budget, dedicated
#   scratch dir wiped between faces, zstd shuffle codec, non-empty-
#   record guard, idempotent relaunch, cpu-calib gate (2x median,
#   retry-once-else-dirty).
#
#   NEW in v4 (r11 verdict items 1/3/5):
#   a. recall faces: recall_exact at sf10 (ground truth = the full
#      74.6M-pair uncapped verify, feasible at 500k); recall_sampled
#      (first SPARK_GRAFT_RECALL_BANDS=2 bands) at sf10 AND sf40 — the
#      sf10 pairing measures the Horvitz–Thompson estimator's residual
#      bias against exact before the sf40 number is trusted.
#   b. DUAL calib gate: a face whose record shows spill_disk_gb > 1 is
#      also dirty when its calib_io exceeds 2x the chain's io median —
#      BENCHNOTES r11 measured a 2x wall swing at equal cpu calib in
#      the spill regime, so a spill-bound record needs a clean io
#      window, not just a clean cpu one.
#   c. sf100 (5M docs): diag first (cheap, exact candidate volumes),
#      then an ARITHMETIC GO/NO-GO gate (projected live verify scratch
#      from the measured sf40 byte rate, volume ratio, and the
#      verify-group divisor) before the heavy faces run. The budget
#      faces run band-grouped (8) AND verify-grouped (8): at 32
#      pairs/doc the 5M candidate set is ~160M pairs — the volume whose
#      MONOLITHIC verify killed the r11 fixed-cap 2M face — so the
#      verify tail must be sliced like candidate generation already is.
#      Both sf40 and sf100 budget faces run vg8 so the decade ratio
#      compares like with like (the r11 no-vg sf40 records stay as the
#      monolithic-verify baseline).
set -u
cd /root/repo
mkdir -p target probes/r12
LOG=target/probe12_chain.log
SCRATCH=/root/repo/target/scratch
CALIBS=target/probe12_calibs.txt
CALIBS_IO=target/probe12_calibs_io.txt
: > "$CALIBS"
: > "$CALIBS_IO"

avail_gb() { df -BG --output=avail /root/repo | tail -1 | tr -dc 0-9; }

field_of() { # file field
  python3 -c "import json,sys; print(json.load(open(sys.argv[1])).get(sys.argv[2], 0))" "$1" "$2"
}

# median of an accepted-calib pool file; empty when none
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

echo "=== probe_r12 start $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG

# fixtures: sf10/sf40 survive from r10/r11; sf100 (5M docs) is new
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
export SPARK_GRAFT_RECALL_BANDS=2

# one face attempt; returns 0 when a record landed in target/$name.json
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
  # stage the extraction: a FAILED attempt must never clobber an earlier
  # attempt's valid record (the r12 chain lost a completed dirty-tagged
  # sf100 record exactly this way when its gate retry OOM'd)
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

# arithmetic GO/NO-GO for a heavy sf100 face (v4c): project the verify
# stage's live scratch from the measured sf40 vg8 byte rate scaled by
# the diag-measured candidate-volume ratio, divided by the verify-group
# count, with a 2x safety factor — logged either way, so a NO-GO is a
# written finding with numbers, not a silent skip.
sf100_go() { # anchor_record
  local anchor=$1
  python3 - "$anchor" probes/r12/probe12_diag_minhash_sf100.json probes/r11/probe11_diag_minhash_sf40.json <<'EOF'
import json, subprocess, sys
anchor = json.load(open(sys.argv[1]))
d100 = json.load(open(sys.argv[2]))["diag"]
d40 = json.load(open(sys.argv[3]))["diag"]
budget100 = 32 * 5_000_000
# calibrateMaxBucket on the diag curve grid: largest grid cap within budget
curve = {c: d100.get(f"cand_pairs_c{c}", d100["cand_pairs"] if c == 64 else 0)
         for c in (4, 8, 16, 32, 64)}
vol100 = max((v for v in curve.values() if v <= budget100), default=curve[4])
cap100 = max((c for c, v in curve.items() if v <= budget100), default="<4")
# sf40 budget volume (cap 5 measured r11): between c4 and c8; use c8 as
# the conservative (high) anchor volume so the projected rate is LOW —
# then apply the 2x safety factor the other way on the projection
vol40 = d40["cand_pairs_c8"]
bytes40 = (anchor["shuffle_write_gb"] + anchor["spill_disk_gb"])
proj_total = bytes40 * vol100 / vol40
vg = 8
proj_live = proj_total / vg * 2  # 2x safety
avail = int(subprocess.check_output(
    ["df", "-BG", "--output=avail", "/root/repo"]).split()[-1].rstrip(b"G"))
go = proj_live < avail - 10
print(f"sf100 preflight: grid cap~{cap100} vol={vol100/1e6:.1f}M pairs "
      f"(budget {budget100/1e6:.0f}M); anchor sf40 {bytes40:.1f}G at "
      f"{vol40/1e6:.1f}M pairs; projected total {proj_total:.1f}G, "
      f"live ~{proj_live:.1f}G (vg={vg}, 2x safety) vs {avail}G avail "
      f"-> {'GO' if go else 'NO-GO'}")
sys.exit(0 if go else 1)
EOF
}

# faces: name:op:tag:need_gb:band_groups:verify_groups
#   recall faces first (the round's job #1), then the vg8 sf40 anchors
#   (fresh baseline under the new verify split), then sf100: diag, the
#   arithmetic gate, and the two heavy faces.
FACES="
recall_exact:recall_exact:sf10:70::
recall_sampled:recall_sampled:sf10:70::
recall_sampled:recall_sampled:sf40:70::
minhash_budget_vg8:minhash_budget:sf40:70:8:8
clusters_budget_vg8:clusters_budget:sf40:70:8:8
diag_minhash:diag_minhash:sf100:30::
minhash_budget_vg8:minhash_budget:sf100:70:8:8
clusters_budget_vg8:clusters_budget:sf100:70:8:8
"

for face in $FACES; do
  fname=$(echo "$face" | cut -d: -f1)
  op=$(echo "$face" | cut -d: -f2)
  tag=$(echo "$face" | cut -d: -f3)
  need=$(echo "$face" | cut -d: -f4)
  bg=$(echo "$face" | cut -d: -f5)
  vg=$(echo "$face" | cut -d: -f6)
  dir=target/$tag
  name=probe12_${fname}_$tag
  if [ -s probes/r12/$name.json ]; then
    echo "SKIP $name (already recorded)" >> $LOG
    continue
  fi
  # the sf100 heavy faces pass the arithmetic gate first (v4c); the
  # anchor is this chain's own sf40 vg8 record of the same op
  if [ "$tag" = sf100 ] && [ "$op" != diag_minhash ]; then
    anchor=probes/r12/probe12_${fname}_sf40.json
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
  echo "=== $name $(date +%H:%M:%S) avail=${free}G bg=${bg:-none} vg=${vg:-none}" >> $LOG
  attempt_face "$name" "$op" "$dir" "$bg" "$vg" || continue
  # calib gate (v3) + io gate for spill-bound records (v4b):
  # retry ONCE on a dirty window, else tag the record
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
    attempt_face "$name" "$op" "$dir" "$bg" "$vg" && dirty=$(check_dirty)
  fi
  if [ "$dirty" = 1 ]; then
    mark_dirty target/$name.json
    echo "DIRTY-KEPT $name (tagged, excluded from median pools)" >> $LOG
  else
    field_of target/$name.json calib >> "$CALIBS"
    field_of target/$name.json calib_io >> "$CALIBS_IO"
  fi
  cp target/$name.json probes/r12/
  echo "OK $name $(cat target/$name.json)" >> $LOG
done

unset SPARK_GRAFT_RUNS SPARK_DRIVER_MEM SPARK_GRAFT_RECALL_BANDS
echo "PROBE_R12_DONE $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG
