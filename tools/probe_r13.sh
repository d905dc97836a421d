#!/usr/bin/env bash
# Round-13 probe chain — the r12 verdict's two open scale claims:
#   1. Make the composed clusters face's 5M-doc exponent QUOTABLE: the
#      committed r12 record (2007.7 s) sits on a calib-2.21 window and a
#      post-close rerun heap-OOM'd in the stage-81 verify slice (2 of 5
#      heavy 5M runs died at 48 g). The scale-correct notch is vg16 —
#      halve the verify slice's working set (memory-per-data constant,
#      as a cluster would), NOT a bigger heap. Both sf40 and sf100 run
#      vg16 so the decade ratio compares like with like, and the sf40
#      faces double as fresh calib-pool seeds + the vg8→vg16 overhead
#      measurement at 2M (r12's vg8 records are the baseline).
#   2. Close the recall ledger at the 5M operating point: recall_sampled
#      (k=2 discovery, HT reweighting — estimator validated within 0.23%
#      of exact at 500k in r12) at sf100. The instrument's 2-band
#      UNCAPPED verify at 5M is ~230M pairs — the volume class whose
#      monolithic verify killed the r11 2M face — so lshSurvivalStats
#      grew the same verifyGroups knob (r13, spec-pinned ≡ monolithic)
#      and the face runs vg16.
# Protocol v4 carried over from r12 unchanged: df preflight with a
# per-face budget, dedicated scratch wiped between faces, zstd shuffle
# codec, staged non-clobbering record extraction, idempotent relaunch,
# cpu-calib gate (2x median, retry-once-else-dirty) + io gate for
# spill-bound records, arithmetic GO/NO-GO for heavy sf100 faces.
set -u
cd /root/repo
mkdir -p target probes/r13
LOG=target/probe13_chain.log
SCRATCH=/root/repo/target/scratch
CALIBS=target/probe13_calibs.txt
CALIBS_IO=target/probe13_calibs_io.txt
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

echo "=== probe_r13 start $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG

# fixtures survive from r10/r11/r12; regenerate only if missing
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
# verify scratch from this chain's own sf40 vg16 byte rate, the
# diag-measured candidate-volume ratio (r12 sf100 diag / r11 sf40 diag),
# and the vg16 divisor, with a 2x safety factor — logged either way.
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
      f"(budget {budget100/1e6:.0f}M); anchor sf40 vg16 {bytes40:.1f}G at "
      f"{vol40/1e6:.1f}M pairs; projected total {proj_total:.1f}G, "
      f"live ~{proj_live:.1f}G (vg={vg}, 2x safety) vs {avail}G avail "
      f"-> {'GO' if go else 'NO-GO'}")
sys.exit(0 if go else 1)
EOF
}

# faces: name:op:tag:need_gb:band_groups:verify_groups — cheap pool
# seeds first, then the sf40 vg16 anchors, then sf100 heavy (the key
# clusters face BEFORE minhash: if disk or time dies, job #1 is banked)
FACES="
recall_sampled:recall_sampled:sf10:70::
minhash_budget_vg16:minhash_budget:sf40:70:8:16
clusters_budget_vg16:clusters_budget:sf40:70:8:16
recall_sampled_vg16:recall_sampled:sf100:70::16
clusters_budget_vg16:clusters_budget:sf100:70:8:16
minhash_budget_vg16:minhash_budget:sf100:70:8:16
"

for face in $FACES; do
  fname=$(echo "$face" | cut -d: -f1)
  op=$(echo "$face" | cut -d: -f2)
  tag=$(echo "$face" | cut -d: -f3)
  need=$(echo "$face" | cut -d: -f4)
  bg=$(echo "$face" | cut -d: -f5)
  vg=$(echo "$face" | cut -d: -f6)
  dir=target/$tag
  name=probe13_${fname}_$tag
  if [ -s probes/r13/$name.json ]; then
    echo "SKIP $name (already recorded)" >> $LOG
    continue
  fi
  # heavy sf100 budget faces pass the arithmetic gate first; the recall
  # face is exempt (its generation is 2/64 of the band volume and its
  # verify is vg16-sliced — the df preflight covers it)
  if [ "$tag" = sf100 ] && [ "$op" != recall_sampled ]; then
    anchor=probes/r13/probe13_${fname}_sf40.json
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
  cp target/$name.json probes/r13/
  echo "OK $name $(cat target/$name.json)" >> $LOG
done

unset SPARK_GRAFT_RUNS SPARK_DRIVER_MEM SPARK_GRAFT_RECALL_BANDS
echo "PROBE_R13_DONE $(date +%H:%M:%S) avail=$(avail_gb)G" >> $LOG
