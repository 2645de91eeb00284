#!/usr/bin/env bash
# Cold-minima ledger, one command (r13 verdict task 6): resolves the
# PREVIOUS committed BENCH_DETAIL.json automatically (the last commit
# that touched it — i.e. the prior round's capture when the worktree
# holds a fresh uncommitted one) and runs graft.BenchColdLedger against
# it. Quiet-gating, top-N/mover selection and env knobs live in the
# Scala main; this wrapper only removes the hand-run `git show` step.
#
# Usage: tools/cold_ledger.sh [curDetail] [out]
set -euo pipefail
cd "$(dirname "$0")/.."

cur="${1:-BENCH_DETAIL.json}"
out="${2:-BENCH_COLD_LEDGER.json}"
prev=/tmp/prev_bench_detail.json

prev_commit=$(git log -n 1 --format=%H -- BENCH_DETAIL.json)
if [[ -z "$prev_commit" ]]; then
  echo "[cold_ledger] no committed BENCH_DETAIL.json found — running top-N only" >&2
  prev_arg="-"
else
  git show "${prev_commit}:BENCH_DETAIL.json" > "$prev"
  echo "[cold_ledger] prev detail from ${prev_commit:0:12}" >&2
  prev_arg="$prev"
fi

SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
exec sbt -batch "runMain graft.BenchColdLedger $cur $prev_arg $out"
