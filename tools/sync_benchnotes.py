#!/usr/bin/env python3
"""Sync BENCHNOTES.md's official-record block from BENCH_FULL.json.

r12 verdict item 6: the bench-comparability prose drifted from the
committed record because it was hand-written against a pre-close run.
The fix is mechanical: round_close regenerates a marked block with the
record's own numbers after every official bench, and FAILS if the
record is malformed — future rounds quote the block, never hand-copied
clocks. Hand prose elsewhere in the file should reference rounds by
their committed BENCH_r{N}.json (immutable), not re-quote sweep clocks.
"""
import json
import re
import sys

BEGIN = "<!-- BENCH_RECORD_AUTO_BEGIN -->"
END = "<!-- BENCH_RECORD_AUTO_END -->"

rec = json.load(open("BENCH_FULL.json"))
for field in ("value", "sweep_totals", "calib", "calib_io", "queries_median"):
    if field not in rec:
        sys.exit(f"BENCH_FULL.json is malformed: missing {field}")
nq = len(rec["queries_median"])
sweeps = " / ".join(f"{t:.1f}" for t in rec["sweep_totals"])
spread = (max(rec["sweep_totals"]) / min(rec["sweep_totals"]) - 1) * 100
# record provenance (r16 verdict item 1): the block names WHO produced
# the record it quotes, so a later record from the other producer is a
# visible supersession, not a silent ambiguity
source = rec.get("source", "unknown (pre-r17 record)")
calibs = rec.get("calibs")
calib_str = (f"calib median {rec['calib']:.3f} of " +
             "[" + " / ".join(f"{c:.2f}" for c in calibs) + "]"
             if calibs else f"calib {rec['calib']:.3f}")
block = f"""{BEGIN}
**Official bench record (auto-synced from BENCH_FULL.json by
round_close — quote THESE numbers, do not hand-copy sweep clocks):**
total **{rec['value']:.1f} s** = per-query median over sweeps
[{sweeps}] s ({spread:.1f}% same-code spread), {nq} queries, sf0.1
local[32], source {source}, {calib_str} / io {rec['calib_io']:.3f}.
{END}"""

notes = open("BENCHNOTES.md").read()
if BEGIN in notes:
    notes = re.sub(re.escape(BEGIN) + ".*?" + re.escape(END), block,
                   notes, flags=re.S)
else:
    notes = notes.rstrip("\n") + "\n\n" + block + "\n"
open("BENCHNOTES.md", "w").write(notes)
print(f"BENCHNOTES auto-block synced: total {rec['value']:.1f}s, "
      f"sweeps [{sweeps}], {nq} queries")
