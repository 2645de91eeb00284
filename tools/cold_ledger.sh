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

# Self-compare guard (r14 ADVICE): if the worktree BENCH_DETAIL.json is
# unmodified vs HEAD, the newest commit touching it IS the current
# capture — comparing against it would report no movers. Step back to
# the second-newest commit in that case (the genuinely previous round).
declare -a commits
mapfile -t commits < <(git log -n 2 --format=%H -- BENCH_DETAIL.json)
prev_commit="${commits[0]:-}"
if [[ "$cur" == "BENCH_DETAIL.json" && -n "$prev_commit" ]] \
    && git diff --quiet HEAD -- BENCH_DETAIL.json 2>/dev/null; then
  if [[ -n "${commits[1]:-}" ]]; then
    echo "[cold_ledger] worktree BENCH_DETAIL.json == HEAD capture — using the commit before it" >&2
    prev_commit="${commits[1]}"
  else
    echo "[cold_ledger] WARNING: current capture is the ONLY committed one — ledger would self-compare; running top-N only" >&2
    prev_commit=""
  fi
fi
if [[ -z "$prev_commit" ]]; then
  echo "[cold_ledger] no prior committed BENCH_DETAIL.json — running top-N only" >&2
  prev_arg="-"
else
  git show "${prev_commit}:BENCH_DETAIL.json" > "$prev"
  echo "[cold_ledger] prev detail from ${prev_commit:0:12}" >&2
  prev_arg="$prev"
fi

SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
exec sbt -batch "runMain graft.BenchColdLedger $cur $prev_arg $out"
