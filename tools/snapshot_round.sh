#!/usr/bin/env bash
# Commit the per-round measurement artifacts (bench / correctness /
# leakcheck / smoke) so the round record is in-tree at round end instead
# of landing one driver-commit late. Safe to run any time: it stages
# only the artifact globs and commits only when something changed.
set -uo pipefail
cd "$(dirname "$0")/.."
for spec in 'BENCH_LOCAL.json' 'BENCH_LOCAL_r*.json' 'BENCH_r*.json' \
    'BENCH_LOCAL_partial_*.json' 'BENCH_LOCAL*_contended.json' \
    'BENCH_SUMMARY.json' 'CORRECTNESS_r*.json' 'LEAKCHECK.json' \
    'COPYCHECK.json' 'SMOKE_SF01_r*.json' 'PREFIX_FANOUT*.json'; do
  git add -- "$spec" 2>/dev/null || true
done
if ! git diff --cached --quiet; then
  git commit -m "Snapshot round bench/correctness artifacts"
else
  echo "snapshot_round: nothing to commit"
fi
