#!/bin/bash
# Scale-lane runner: times each lane query at sf0.1 and at the ScaleGen
# sf1 replication (plus special rows), ONE FRESH JVM per (query, dir)
# via tools/runmain.sh + SPARK_GRAFT_ONLY, and assembles
# BENCH_r{N}_sf1.json. Usage: tools/scale_lane.sh <round> [outfile]
set -u
ROUND=${1:?round}
OUT=${2:-BENCH_r${ROUND}_sf1.json}
cd /root/repo

QUERIES="assoc_rules bm25_topk corpus_cube dedup_clusters dedup_minhash_lsh \
dedup_ngram_jaccard dedup_simhash dedup_yield event_funnel fd_discovery \
histogram_drift iqr_outliers_approx ivf_topk ks_drift_approx \
leakage_safe_split mad_outliers mad_outliers_approx mutual_info \
profile_lineitem profile_lineitem_full quantiles_exact sessionize \
spearman_approx streaming_incremental_profile tokenize_ids winnow_near_dup \
approx_overlap bpe_encode bpe_merges dsir_weights semdedup \
substring_contamination substring_dup substring_dup_coverage self_repeat \
substring_dup_chunked self_repeat_chunked approx_overlap_states \
interarrival_stats_approx session_stats_approx time_to_convert_approx \
quality_logreg embedding_project unimax_mix path_templates corpus_card \
decontam_execute substring_dup_execute ccnet_buckets pca_power \
dup_pagerank trigram_lm calibration_table shard_manifest domain_topk \
char_entropy quality_filter_execute jaccard_dedup_execute groupdro_train corpus_curate doremi_select minhash_dedup_execute semdedup_execute ccnet_select \
self_repeat_execute ndcg_eval bm25_multi kneser_ney_lm gopher_rules \
mmr_diversify recall_curve minhash_clusters naive_bayes_filter kn_cross_ppl \
quality_gate knn_label_eval cluster_purity silhouette dedup_survival \
lsh_recall_curve embedding_pq hard_negatives_ann dedup_incremental_lsh \
image_near_dup audio_near_dup image_dedup_execute kmeans_train \
temperature_mix curriculum_epochs streaming_state_dedup \
embedding_outliers cross_dedup_matrix minhash_calibration \
freshness_weights dup_pair_explain dedup_rate_by_batch \
audio_dedup_execute dedup_state_compact ivf_from_index image_incremental_dedup audio_incremental_dedup"

run_one() { # dir query [extra env as VAR=VAL ...]
  local dir=$1 q=$2; shift 2
  env "$@" SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY="$q" tools/runmain.sh graft.Bench 2>/dev/null \
    | grep -E '^\{' \
    | python3 -c "import json,sys; print(json.load(sys.stdin)['queries'].get('$q','null'))"
}

TMP=$(mktemp)
echo "{}" > "$TMP"
for q in $QUERIES; do
  a=$(run_one /root/testdata/sf0.1 "$q")
  b=$(run_one target/sf1 "$q")
  echo "lane $q sf0.1=$a sf1=$b" >&2
  python3 - "$TMP" "$q" "$a" "$b" <<'EOF'
import json, sys
p, q, a, b = sys.argv[1:]
d = json.load(open(p))
d.setdefault("q01", {})[q] = float(a)
d.setdefault("q1", {})[q] = float(b)
json.dump(d, open(p, "w"))
EOF
done

# special rows: content-varying (char-salt) substring/winnow family +
# batch-geometry probe
for q in substring_dup substring_dup_chunked self_repeat_chunked decontam_execute substring_dup_execute; do
  v=$(run_one target/sf1cs "$q")
  echo "lane charsalt $q=$v" >&2
  python3 - "$TMP" "$q" "$v" <<'EOF2'
import json, sys
p, q, v = sys.argv[1:]
d = json.load(open(p))
d.setdefault("q1cs", {})[q] = float(v)
json.dump(d, open(p, "w"))
EOF2
done
wcs=$(run_one target/sf1cs winnow_near_dup)
sb40=$(run_one target/sf1 streaming_incremental_profile SPARK_GRAFT_STREAM_BATCHES=40)
kmfix=$(run_one target/sf1 kmeans_train SPARK_GRAFT_KMEANS_MOD=830)
echo "lane specials winnow_cs=$wcs stream_b40=$sb40 kmeans_fixed_k=$kmfix" >&2

python3 - "$TMP" "$OUT" "$ROUND" "$wcs" "$sb40" "$kmfix" <<'EOF'
import json, sys
tmp, out, rnd, wcs, sb40, kmfix = sys.argv[1:]
d = json.load(open(tmp))
growth = {q: round(d["q1"][q] / d["q01"][q], 1) for q in d["q01"]}
doc = {
  "metric": "sf1_scale_lane", "unit": "sec",
  "sf": "target/sf1 (ScaleGen K=10 over sf0.1)",
  "data_ratio": 10, "iterations": 2, "agg": "min",
  "isolation": "one JVM per query",
  "queries_sf0_1": d["q01"], "queries_sf1": d["q1"], "growth": growth,
  "winnow_near_dup_charsalt_sf1": float(wcs),
  "winnow_note": "charsalt = SPARK_GRAFT_SCALE_SALT=char content-varying replication (no shared 8-gram across copies) - the row that measures the engine rather than replication",
  "streaming_incremental_profile_sf1_b40": float(sb40),
  "kmeans_train_sf1_fixed_k": float(kmfix),
  "kmeans_note": "fixed_k = SPARK_GRAFT_KMEANS_MOD=830 at 10x data (same ~24 centroids as sf0.1 %83): the declared key's init predicate makes k grow with the corpus, so its assign stage is O(N*k*D) = quadratic BY KEY CONSTRUCTION; at fixed k (the training-hyperparameter regime) the operator is linear - this row is the evidence (VERDICT r13 #3)",
  "streaming_note": "b40 = 40 micro-batches (constant rows per batch at 10x data) vs the default 4 (constant batch count): slower, pinning the growth to per-micro-batch fixed overhead, not the profile computation",
  "queries_sf1_charsalt": d.get("q1cs", {}),
  "excluded": {"spearman_corr": "exact mode is WindowGuard-enforced at 2M rows (r10) and refuses sf1 by design; spearman_approx is the scale row",
    "hard_negatives": "|Q| x N brute force with |Q| proportional to the corpus (vec_id % 97) - 10x data means ~100x work by definition, like ann_cosine_topk; hard_negatives_ann is that family's measured scale row (r12)"},
  "embedding_pq_note": "r12: codebook pinned at the vec_id < 2000 sub-centroids (corpus-size-independent, PQ's actual contract), so the lane now MEASURES the linear broadcast-encode instead of excluding it",
}
json.dump(doc, open(out, "w"), indent=0)
print("wrote", out)
EOF
rm -f "$TMP"
