#!/bin/bash
# Same-window A/B control for the r19 builder-local creep band
# (VERDICT r20 task 3): run the five creep queries + canary under the
# CURRENT tree and under the last-closed-round binary (worktree at
# $OLD_REF), interleaved A-B-A-B so both binaries sample the same host
# window. Filtered runs inflate the FIRST query (broadcast-infra init),
# so analytics_rfm leads alphabetically as the absorber in both.
#
# Usage: tools/creep_ab.sh <old_ref> <rounds>
set -u
OLD_REF=${1:?old ref}
ROUNDS=${2:-2}
QS=analytics_rfm,dedup_containment_exact,dedup_setsim_words,graph_components,stats_bootstrap_ci,text_bpe_train
OLD_DIR=/root/repo_old
if [ ! -d "$OLD_DIR" ]; then
  git -C /root/repo worktree add "$OLD_DIR" "$OLD_REF" || exit 1
fi
# pre-build both so A/B samples contain zero compile time
(cd "$OLD_DIR" && sbt -batch compile > /tmp/creep_build_old.log 2>&1) || exit 1
(cd /root/repo && sbt -batch compile > /tmp/creep_build_new.log 2>&1) || exit 1
for i in $(seq 1 "$ROUNDS"); do
  for side in new old; do
    dir=/root/repo; [ "$side" = old ] && dir=$OLD_DIR
    echo "=== round $i side $side ==="
    (cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_RUNS=3 \
      SPARK_GRAFT_BENCH_ONLY=$QS \
      sbt -batch 'runMain graft.Bench' 2>&1 | grep '\[bench\]')
  done
done
