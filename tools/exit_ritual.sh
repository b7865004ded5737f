#!/bin/bash
# Round-exit validation, run ON the round's final source commit
# (r10/r11 verdict item: the recorded hashes must match HEAD):
#   1. full `sbt test`
#   2. full Verify + DuckDB compare at sf0.001 AND sf0.01 (one-shot
#      JVMs on the compiled classes — no sbt server lock)
#   3. closing clean bench at sf0.1 (one JSON line; check errors:[] and
#      grep the log for "large task binary")
# Record the results + `git rev-parse --short HEAD` in SURVEY.md's
# round exit-validation section, then commit docs ONLY afterwards.
set -e
cd /root/repo
HEAD=$(git rev-parse --short HEAD)
if ! git diff --quiet HEAD -- src/; then
  echo "FATAL: uncommitted src/ changes — commit first, the ritual must run on HEAD" >&2
  exit 1
fi
echo "=== exit ritual on $HEAD ==="

echo "--- 1/3 sbt test"
# full log kept: a bare tail loses WHICH test failed (bit once in r13 —
# a 286/1 board with no attributable name); failures surface by name here
sbt test > /tmp/exit_test.log 2>&1 || true
grep -E "FAILED \*\*\*" /tmp/exit_test.log | head -20
tail -6 /tmp/exit_test.log

echo "--- 2/3 Verify + oracle at both scales"
for SF in 0.001 0.01; do
  OUT=/tmp/exit_${HEAD}_sf${SF}
  rm -rf "$OUT"
  CPUS=$([ "$SF" = 0.001 ] && echo 8 || echo 12)
  SPARK_GRAFT_CPUS=$CPUS tools/run_jvm.sh graft.Verify /root/testdata/sf$SF "$OUT" \
    > /tmp/exit_verify_${SF}.log 2>&1
  python3 tools/check.py /root/testdata/sf$SF "$OUT" | tail -1
done

echo "--- 3/3 closing bench at sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run_jvm.sh graft.Bench \
  > /tmp/exit_bench.log 2>&1
grep -o '"metric":"total","value":[0-9.]*' /tmp/exit_bench.log
grep -o '"errors":\[[^]]*\]' /tmp/exit_bench.log | head -1
echo "large-task-binary WARNs: $(grep -c 'large task binary' /tmp/exit_bench.log || true)"
echo "=== ritual complete on $HEAD — record these in SURVEY.md ==="
