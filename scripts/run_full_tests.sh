#!/usr/bin/env bash
# Full-tier test run: the ENTIRE suite including the PS_RUN_SLOW-gated
# compile-heavy tier (reference-oracle parity, 8-device CPU-mesh sharding,
# real multi-process jax.distributed, end-to-end CLI), sharded by file so
# one hung file cannot eat the whole budget.
#
#   scripts/run_full_tests.sh                 # ~30-40 min on 1 CPU core
#   PS_TEST_FILE_TIMEOUT=600 scripts/run_full_tests.sh
#
# Cadence (docs/TESTING.md): fast tier (`pytest -q`, ~3 min) on every
# commit; this full tier at least once per round / before release.
set -u
cd "$(dirname "$0")/.."

BUDGET=${PS_TEST_FILE_TIMEOUT:-1200}
failures=()
start=$(date +%s)

for f in tests/test_*.py; do
  t0=$(date +%s)
  if PS_RUN_SLOW=1 timeout "$BUDGET" python -m pytest "$f" -q --no-header; then
    status=ok
  else
    rc=$?
    status="FAIL(rc=$rc)"
    failures+=("$f")
  fi
  echo "== $f: $status in $(( $(date +%s) - t0 ))s"
done

echo "== total: $(( $(date +%s) - start ))s"
if [ "${#failures[@]}" -gt 0 ]; then
  echo "== FAILED FILES: ${failures[*]}"
  exit 1
fi
echo "== all files green"
