#!/bin/bash
# Round-15 sf1 transitive certification for the r14 minhash rework
# (verdict ask 1). Dumps the exact touched-query closure on the r13
# final binary (6c434b5 — sf1-certified lineage: full r12 sweep +
# r13's direct/transitive gates) and on the current binary, from
# SNAPSHOT WORKTREES so builder edits cannot race; the DuckDB
# EXCEPT-ALL diff runs afterwards (tools/sf1_diff_r15.py).
#
# Touched set = transitive closure of queries whose plans reach the
# r14-changed functions (Dedup.shingles persist boundary,
# Dedup.shingleFlat derivation, Dedup.minhashSignatures codegen +
# null-sig filter, Profile.profile caching branch), computed from the
# call graph — NOT eyeballed. x120/x121/a87/st28 are excluded here:
# they landed WITH direct 4-SF oracle gates.
set -euo pipefail
TOUCHED="x02_dedup_jaccard x03_dedup_minhash x14_dedup_keepone \
x20_banded_jaccard x21_pipeline_docs x25_decontaminate \
x44_cluster_sizes x59_cluster_split x63_eval_contamination \
x66_near_dedup_against x78_profile x84_source_overlap \
x85_ngram_novelty x86_oph_minhash x99_neardup_eval \
x115_cluster_profile x116_threshold_sensitivity x118_novelty_curve"

OLD=6c434b5
NEW=$(git -C /root/repo rev-parse HEAD)
echo "[sf1] old=$OLD new=$NEW"

cd /root/repo
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.EnsureSf1"

for pair in "r13bin:$OLD" "r15bin:$NEW"; do
  tag=${pair%%:*}; ref=${pair##*:}
  wt=/tmp/graft_$tag
  git -C /root/repo worktree add -f --detach "$wt" "$ref" 2>/dev/null || true
  cd "$wt"
  echo "[sf1] dumping $tag ($ref) ..."
  SPARK_GRAFT_CPUS=32 sbt -batch \
    "runMain graft.Verify /tmp/graft_sf1 /tmp/sf1_$tag $TOUCHED" \
    2>&1 | grep -E '\[verify\]|error\]' || true
done
echo "[sf1] dumps done"
