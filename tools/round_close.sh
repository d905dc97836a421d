#!/usr/bin/env bash
# Round close-out, mechanized (r9 verdict items 4 and 6 — the official
# bench record must be produced on a quiet box, and the README test
# count has drifted by hand two rounds running):
#   1. GATE: refuse to run while a probe chain or any sbt JVM is alive
#      (the r9 official record was contaminated by exactly that), or
#      while the bench lock is held.
#   2. sbt test → regenerate the README test-count line from the log.
#   3. Official full bench at sf0.1 (lock acquired by Bench itself) →
#      BENCH_FULL.json.
#   4. Print the round-close git status so uncommitted driver artifacts
#      (BENCH_FULL.json, LEAKCHECK.json — the two-round-old nit) are
#      impossible to miss.
set -euo pipefail
cd /root/repo

if pgrep -f 'probe_r[0-9]+\.sh|graft\.ScaleProbe' > /dev/null; then
  echo "REFUSE: a probe chain is running — close the round after PROBE_*_DONE" >&2
  exit 1
fi
if pgrep -f 'sbt-launch|xsbt' > /dev/null; then
  echo "REFUSE: an sbt JVM is alive — the bench box must be quiet" >&2
  exit 1
fi

LOG=target/round_close_test.log
sbt -batch test 2>&1 | tee "$LOG" | tail -5
counts=$(grep -E 'Total number of tests run|Suites: completed' "$LOG" \
  | tr -dc '0-9\n' | paste -sd' ')   # "<tests> <suites> <aborted>"
tests=$(echo "$counts" | awk '{print $1}')
suites=$(echo "$counts" | awk '{print $2}')
grep -q 'TESTS FAILED' "$LOG" && { echo "REFUSE: tests red" >&2; exit 1; }
sed -i -E "s/[0-9]+ tests across [0-9]+ suites/${tests} tests across ${suites} suites/" README.md
echo "README test count synced: ${tests} tests / ${suites} suites"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  2>&1 | grep '^{"metric"' | tail -1
echo "--- round-close git status (commit anything below before the driver snapshots):"
git status --short
