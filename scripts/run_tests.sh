#!/usr/bin/env bash
# Full-suite runner with bounded memory: one pytest SUBPROCESS PER TEST FILE.
#
# Why: a single `pytest tests/` process accumulates XLA executables + traced
# constants across ~25 modules and dies with a native fault at ≈50 GB RSS on
# this host (README "Tests"); per-file isolation caps the process at the
# largest single module (~6 GB) and releases everything between files.
# jax.clear_caches() inside one process does not reclaim enough — compiled
# executables pinned by live jitted closures survive it.
#
# Usage: scripts/run_tests.sh [extra pytest args...]
# Runs every tests/test_*.py to completion (no fail-fast across files),
# prints a per-file summary, exits nonzero if any file failed.
set -u
cd "$(dirname "$0")/.."

extra=("$@")
failed=()
total_t0=$SECONDS
for f in tests/test_*.py; do
    t0=$SECONDS
    if python -m pytest "$f" -q --no-header "${extra[@]}"; then
        status=ok
    else
        status=FAIL
        failed+=("$f")
    fi
    echo "== $f: $status ($((SECONDS - t0))s)"
done
echo "== total: $((SECONDS - total_t0))s, ${#failed[@]} failed file(s)"
for f in "${failed[@]:-}"; do [ -n "$f" ] && echo "   FAILED: $f"; done
[ ${#failed[@]} -eq 0 ]
