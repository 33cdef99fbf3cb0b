#!/bin/bash
# Two-point growth-curve lane (VERDICT r13 #4, widened r15 per VERDICT
# r14 #3): times ~34 scale-critical keys at sf0.1, at the ScaleGen K=10
# replication (target/sf1) AND at the K=100 replication (target/sf10),
# one fresh JVM per (query, dir). Assembly is DELEGATED to
# tools/sf10_assemble.py (ADVICE r14: this script used to duplicate the
# flag logic inline with the raw r13 rule, so the two writers could
# disagree on flags for the same timings) — the stderr lane log is teed
# to a file and the assembler is the only flag-taxonomy implementation.
# The same log also feeds tools/sf1_from_sf10.py, which emits the
# sf1-lane-format artifact (VERDICT r14 #4) from the identical runs.
#
# Declared scale rows (VERDICT r14 #2): the artifact-served twins
# ivf_from_index / semdedup_from_index ARE the scale rows; the in-plan
# forms ivf_topk / semdedup_execute are quadratic BY KEY CONSTRUCTION
# (rate-based %83 predicate => cents ∝ N => O(N²·D/83)); they are named
# excluded controls in the assembler's `excluded` map and are NOT run
# here (measured once at r14: 57.08 s / 67.66 s at sf10 vs 2.47 / 3.72
# for the bit-identical twins).
#
# Usage: tools/scale_lane_sf10.sh <round> [outfile]
# Expects target/sf1 and target/sf10 (tools/runmain.sh
# graft.tools.ScaleGen with SPARK_GRAFT_SCALE_K=10 / 100).
set -u
ROUND=${1:?round}
OUT=${2:-BENCH_r${ROUND}_sf10.json}
LOG=${3:-target/sf10_lane_r${ROUND}.log}
cd /root/repo

# r14 set (minus the two demoted in-plan controls) + the text/training
# lanes that had only one-hop evidence (VERDICT r14 #3) + the seven r14
# keys (VERDICT r14 #4) + the round-15 keys (E229-E233).
QUERIES="profile_lineitem profile_lineitem_full dedup_minhash_lsh \
dedup_clusters minhash_dedup_execute jaccard_dedup_execute \
quality_filter_execute substring_dup_execute decontam_execute \
dedup_incremental_lsh dedup_state_compact image_incremental_dedup \
audio_incremental_dedup ivf_from_index semdedup_from_index \
trigram_lm kneser_ney_lm bpe_merges bpe_encode dsir_weights \
corpus_curate pca_power streaming_state_dedup kcenter_coreset \
el2n_select forgetting_events c4_rules c4_filter_execute dup_line_stats \
rholoss_select tracin_scores data_map prototype_prune_from_index \
streaming_interval_join d4_select flesch_readability"

run_one() { # dir query [extra env as VAR=VAL ...]
  local dir=$1 q=$2; shift 2
  env "$@" SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY="$q" timeout 900 tools/runmain.sh graft.Bench 2>/dev/null \
    | grep -E '^\{' \
    | python3 -c "import json,sys; print(json.load(sys.stdin)['queries'].get('$q','null'))" \
    || echo null
}

: > "$LOG"
for q in $QUERIES; do
  a=$(run_one /root/testdata/sf0.1 "$q")
  b=$(run_one target/sf1 "$q")
  c=$(run_one target/sf10 "$q")
  echo "lane $q sf0.1=$a sf1=$b sf10=$c" | tee -a "$LOG" >&2
done

# special: kmeans at FIXED k across all three scales (mod tracks the
# corpus so ~24 centroids everywhere — the linear operator regime; the
# declared %83 key is k ∝ N and thus quadratic BY KEY CONSTRUCTION,
# pinned at sf1 already, excluded here to bound lane wall-clock)
km01=$(run_one /root/testdata/sf0.1 kmeans_train)
km1=$(run_one target/sf1 kmeans_train SPARK_GRAFT_KMEANS_MOD=830)
km10=$(run_one target/sf10 kmeans_train SPARK_GRAFT_KMEANS_MOD=8300)
echo "lane kmeans fixed-k sf0.1=$km01 sf1=$km1 sf10=$km10" | tee -a "$LOG" >&2

python3 tools/sf10_assemble.py "$LOG" "$ROUND" "$OUT"
python3 tools/sf1_from_sf10.py "$LOG" "$ROUND" "BENCH_r${ROUND}_sf1.json"
