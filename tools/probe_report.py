#!/usr/bin/env python3
"""Render the r7 scale-probe results as BENCHNOTES markdown tables:
heavy-operator times at 5k/50k/500k docs with 10x-step ratios, and the
full-surface sf0.1 -> sf1 per-query ratios. Reads the probe3_*.json
files tools/probe_chain.sh leaves in target/."""
import json
import sys

T = "target"


def load(name, prefix="probe3"):
    with open(f"{T}/{prefix}_{name}.json") as f:
        return json.load(f)


def calib_line(recs):
    """One line with BOTH calibration dimensions (r8: totals track the
    I/O calib, ANTI-correlate with the CPU calib on this box — render
    both so cross-round tables can be normalized mechanically)."""
    cpu = " ".join(f"{r.get('calib', 0):.2f}" for r in recs)
    io = " ".join(f"{r['calib_io']:.2f}" if "calib_io" in r else "n/a"
                  for r in recs)
    return f"calib(cpu): {cpu}; calib(io): {io}"


def heavy():
    p = sys.argv[2] if len(sys.argv) > 2 else "probe4"
    a, b, c = load("sfc5k", p), load("sf1", p), load("sf10", p)
    print(calib_line([a, b, c]) + f"; failed: 5k={a['failed']} "
          f"50k={b['failed']} 500k={c['failed']}")
    print()
    print("| query | 5k s | 50k s | 500k s | 50k/5k | 500k/50k | 500k/5k |")
    print("|---|---|---|---|---|---|---|")
    rows = []
    for q in a["queries"]:
        ta = a["queries"].get(q)
        tb = b["queries"].get(q)
        tc = c["queries"].get(q)
        if ta and tb and tc:
            rows.append((q, ta, tb, tc, tb / ta, tc / tb, tc / ta))
    rows.sort(key=lambda r: -r[6])
    for q, ta, tb, tc, r1, r2, r3 in rows:
        print(f"| {q} | {ta:.2f} | {tb:.2f} | {tc:.2f} "
              f"| {r1:.1f}x | {r2:.1f}x | {r3:.0f}x |")
    sa = sum(r[1] for r in rows)
    sb = sum(r[2] for r in rows)
    sc = sum(r[3] for r in rows)
    print(f"| **total** | {sa:.1f} | {sb:.1f} | {sc:.1f} "
          f"| {sb/sa:.1f}x | {sc/sb:.1f}x | {sc/sa:.0f}x |")


def full():
    a, b = load("full01"), load("full1")
    print(calib_line([a, b]) +
          f"; failed: sf0.1={a['failed']} sf1={b['failed']}")
    qa, qb = a["queries"], b["queries"]
    rows = [(q, qa[q], qb[q], qb[q] / qa[q]) for q in qa
            if q in qb and qa[q] and qb[q]]
    rows.sort(key=lambda r: -r[3])
    print(f"n={len(rows)}  total sf0.1={sum(r[1] for r in rows):.1f}s  "
          f"sf1={sum(r[2] for r in rows):.1f}s  "
          f"ratio={sum(r[2] for r in rows)/sum(r[1] for r in rows):.2f}x")
    import statistics
    print(f"median ratio {statistics.median(r[3] for r in rows):.2f}x")
    print()
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for q, ta, tb, r in rows[:int(sys.argv[2]) if len(sys.argv) > 2 else 20]:
        print(f"| {q} | {ta:.2f} | {tb:.2f} | {r:.1f}x |")


def scaleprobe():
    """Render graft.ScaleProbe one-line records (probes/r8/probe{5,6}_*
    or target/) as a per-op scale table: usage `scaleprobe <glob>`, e.g.
    `scaleprobe 'probes/r8/probe6_*.json'`."""
    import glob
    recs = []
    for p in sorted(glob.glob(sys.argv[2])):
        with open(p) as f:
            line = f.read().strip()
        if line:
            recs.append(json.loads(line))
    byop = {}
    for r in recs:
        byop.setdefault(r["op"], []).append(r)
    print("| op | " + " | ".join("n / s / calib / io" for _ in range(
        max(len(v) for v in byop.values()))) + " | steps | steps(io-norm) |")
    for op, rs in sorted(byop.items()):
        rs.sort(key=lambda r: r["n"])
        cells = [f"{r['n']} / {r['sec']:.2f}s / {r.get('calib', 0):.2f}"
                 + (f" / {r['calib_io']:.2f}" if "calib_io" in r else "")
                 for r in rs]
        steps = [f"{b['sec']/a['sec']:.1f}x"
                 for a, b in zip(rs, rs[1:])]
        # per-step ratio with BOTH points expressed in multiples of
        # their own run's I/O-calib job — absorbs the box's dominant
        # (I/O-layer) variance between probe windows (r8 finding; the
        # CPU calib ANTI-correlates and is shown for context only)
        steps_io = [f"{(b['sec']/b['calib_io'])/(a['sec']/a['calib_io']):.1f}x"
                    if "calib_io" in a and "calib_io" in b else "n/a"
                    for a, b in zip(rs, rs[1:])]
        print(f"| {op} | " + " | ".join(cells) + " | " + " ".join(steps)
              + " | " + " ".join(steps_io) + " |")


if __name__ == "__main__":
    {"heavy": heavy, "full": full, "scaleprobe": scaleprobe}[sys.argv[1]]()
