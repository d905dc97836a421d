#!/usr/bin/env bash
# Round OPEN, mechanized (r11 verdict item 4): the driver writes its
# per-round evidence (BENCH_r{N}.json, CORRECTNESS_r{N}.json, VERDICT.md,
# ADVICE.md) into the working tree between rounds; when it does not
# commit them itself, the next round's first commit should carry them so
# `git status --short` is clean of driver artifacts from the start.
# Idempotent: a no-op when the tree is already clean.
set -euo pipefail
cd /root/repo
git add -- BENCH_r*.json CORRECTNESS_r*.json BENCH_FULL.json \
  LEAKCHECK.json COPYCHECK.json VERDICT.md ADVICE.md 2>/dev/null || true
if ! git diff --cached --quiet; then
  git commit -m "round open: previous round's driver evidence"
  echo "round_open: committed driver evidence"
else
  echo "round_open: tree already clean of driver artifacts"
fi
