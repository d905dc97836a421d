#!/usr/bin/env bash
# Round OPEN, mechanized (r11 verdict item 4): the driver writes its
# per-round evidence (BENCH_r{N}.json, CORRECTNESS_r{N}.json, VERDICT.md,
# ADVICE.md) into the working tree between rounds; when it does not
# commit them itself, the next round's first commit should carry them so
# `git status --short` is clean of driver artifacts from the start.
# Idempotent: a no-op when the tree is already clean.
set -euo pipefail
cd /root/repo
# add per-file: one `git add` with a list aborts and stages NOTHING if
# any pathspec matches no file (r12 advice — a round missing e.g.
# COPYCHECK.json would silently skip ALL the present artifacts)
for f in BENCH_r*.json CORRECTNESS_r*.json BENCH_FULL.json \
  LEAKCHECK.json COPYCHECK.json VERDICT.md ADVICE.md; do
  if [ -e "$f" ]; then git add -- "$f"; fi
done
if ! git diff --cached --quiet; then
  git commit -m "round open: previous round's driver evidence"
  echo "round_open: committed driver evidence"
else
  echo "round_open: tree already clean of driver artifacts"
fi
