package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.functions.{RollingHash, TextFunctions}
import graft.multimodal.Multimodal
import graft.operators.{Dedup, Sampling, Similarity}
import graft.profiler.{IncrementalProfiler, Profiler, ProfilerConfig}
import graft.streaming.{SessionEvent, StreamingProfile}

/** SparkEntry — Similarity lane of the driver-contract `queries` map (split
  * from the former 4.3k-line monolith, VERDICT r13 task 5). Self-typed
  * to the aggregator so entries use the shared helpers (lineitem,
  * documents, metricQuery, cfg, ...) unqualified. */
private[graft] trait SparkEntrySimilarity { this: SparkEntry.type =>

  protected def similarityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-dimension embedding profile (E130): dead/skewed/shifted axes
    "embedding_dim_stats" -> ((s, dir) =>
      Similarity.dimStats(embeddings(s, dir), "embedding")
        .orderBy("dim")),
    // embedding-space occupancy diversity (E143)
    "cluster_balance" -> ((s, dir) =>
      Similarity.clusterBalance(
        embeddings(s, dir), "vec_id", "embedding", col("vec_id") % 83 === 0)),
    // participation-ratio intrinsic dimensionality (E148)
    "effective_dims" -> ((s, dir) =>
      Similarity.effectiveDims(embeddings(s, dir), "embedding")),
    // similarity search (embeddings table)
    "ann_cosine_topk" -> ((s, dir) =>
      Similarity.cosineTopK(
        embeddings(s, dir), "vec_id", "embedding", col("vec_id") % 97 === 0)
        .orderBy("query_id", "neighbor_id")),
    "ann_lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(
        embeddings(s, dir), "vec_id", "embedding", col("vec_id") % 97 === 0)
        .orderBy("query_id", "neighbor_id")),
    // bitext/parallel-pair mining with the ratio-margin criterion (E240):
    // mine from the %10 query set into the odd-id corpus, k-NN means
    // normalize the cosine, best candidate per source + threshold verdict
    "bitext_mine" -> ((s, dir) =>
      Similarity.bitextMine(
        embeddings(s, dir), "vec_id", "embedding",
        srcPred = col("vec_id") % 10 === 0,
        tgtPred = col("vec_id") % 2 === 1,
        threshold = 1.22)
        .orderBy("src_id")),
    // E246: bitext mining served from the PERSISTED E221 quantizer — the
    // E240 scale path: candidates from the src's 2 probed cells instead
    // of |Q|·|corpus| brute scoring; margins normalize over the candidate
    // k-NN means (the approximation's own fixed point, oracle-replayed)
    "bitext_from_index" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val path = Scratch.dir("graft_ivf", dir)
      if (graft.operators.Dedup.StateStore.rows(s, s"$path/assign").isEmpty)
        Similarity.writeIvfIndex(
          emb, "vec_id", "embedding", col("vec_id") % 83 === 0, path)
      Similarity.bitextMine(
        emb, "vec_id", "embedding",
        srcPred = col("vec_id") % 10 === 0,
        tgtPred = col("vec_id") % 2 === 1,
        threshold = 1.22,
        index = Some(Similarity.readIvfIndex(s, path)))
        .orderBy("src_id")
    }),
    // semantic train/eval decontamination (E244): nearest eval vector per
    // corpus vector (eval set = the %97 query ids), cosine >= 0.9 flags
    "semantic_contamination" -> ((s, dir) =>
      Similarity.semanticContamination(
        embeddings(s, dir), "vec_id", "embedding", col("vec_id") % 97 === 0)
        .orderBy("vec_id")),
    // embedding-space bucketing: nearest-centroid assignment (centroid set
    // = vec_id % 83 == 0), max 6-dp cosine with smaller-id tie-break
    "knn_assign" -> ((s, dir) =>
      Similarity.nearestCentroid(
        embeddings(s, dir), "vec_id", "embedding", col("vec_id") % 83 === 0)
        .orderBy("vec_id")),
    // top principal component by power iteration (E172): one Gram pass,
    // driver-side iteration on the 64x64 matrix, decimal-quantized steps
    // (in-engine training #2 — full hash oracle replays all 8 steps)
    "pca_power" -> ((s, dir) =>
      graft.operators.QualityModel.pcaPower(embeddings(s, dir), "embedding")
        .orderBy("dim_idx")),
    // product quantization encode (E177): 8 subspaces, broadcast
    // sub-codebooks, argmin struct-min - 64 floats -> 8 ids + distortion
    // codebook FIXED at the vec_id < 2000 sub-centroids (a no-op at gate
    // scale, where all ids are < 2000): PQ's whole point is a
    // corpus-size-independent codebook, so the sf1 lane must measure a
    // linear broadcast-encode, not a codebook growing with the data
    // (VERDICT r11 task 6)
    "embedding_pq" -> ((s, dir) =>
      graft.operators.Quantize.productQuantize(
        embeddings(s, dir), "vec_id", "embedding",
        col("vec_id") % 83 === 0 && col("vec_id") < 2000)
        .orderBy("vec_id")),
    // deterministic JL random projection 64->16 (E165): sha256 sign
    // matrix, per-row codegen folds, no shuffle
    "embedding_project" -> ((s, dir) =>
      graft.operators.Quantize.randomProject(
        embeddings(s, dir), "vec_id", "embedding", outDims = 16)
        .orderBy("vec_id", "dim")),
    // label-disjoint hard-negative mining (E168): DPR-style contrastive
    // negatives, broadcast queries, corpus never shuffles
    "hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(
        embeddings(s, dir), "vec_id", "embedding", "label",
        col("vec_id") % 97 === 0, k = 10)
        .orderBy("query_id", "neighbor_id")),
    // E204: the ANN-backed scale path of hard-negative mining — IVF
    // coarse quantizer (the ivf_topk cell structure), 2-probe candidate
    // generation, label cut BEFORE the per-query heap. Deterministic
    // approximation → FULL hash oracle.
    "hard_negatives_ann" -> ((s, dir) =>
      Similarity.hardNegativesAnn(
        embeddings(s, dir), "vec_id", "embedding", "label",
        centroidPred = col("vec_id") % 83 === 0,
        queryPred = col("vec_id") % 97 === 0, nprobe = 2, k = 10)
        .orderBy("query_id", "neighbor_id")),
    // E204 audit: plant an identical-vector twin with a DIFFERENT label
    // for every query — the twin lands in the query's own rank-1 probe
    // cell by construction, so the ANN form must catch it at cos = 1.0
    // (the deterministic guarantee behind "recall < 1 by design");
    // returned labels must be disjoint and cosines exact on recompute.
    "hard_negatives_ann_audit" -> ((s, dir) => {
      import s.implicits._
      val e = embeddings(s, dir).where(col("label").isNotNull)
      val off = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
      val qPred = col("vec_id") % 97 === 0
      val twins = e.where(qPred)
        .select((col("vec_id") + lit(off)).as("vec_id"), col("embedding"),
          (col("label") + lit(1)).as("label"))
      val planted = e.unionByName(twins)
      val ann = Similarity.hardNegativesAnn(
        planted, "vec_id", "embedding", "label",
        centroidPred = col("vec_id") % 83 === 0, queryPred = qPred)
        .localCheckpoint(true)
      val nQueries = e.where(qPred).count()
      val twinCaught = ann
        .where(col("neighbor_id") === col("query_id") + lit(off) &&
          col("cos") === 1.0)
        .count() == nQueries
      val labelsDisjoint =
        ann.where(col("query_label") === col("neighbor_label")).count() == 0L
      val qv = planted.select(col("vec_id").as("query_id"), col("embedding").as("q"))
      val nv = planted.select(col("vec_id").as("neighbor_id"), col("embedding").as("v"))
      val cosExact = ann.join(qv, "query_id").join(nv, "neighbor_id")
        .where(col("cos") =!= round(Similarity.cosine(col("q"), col("v")), 6))
        .count() == 0L
      Seq(
        ("cos_exact_recompute", cosExact),
        ("labels_disjoint", labelsDisjoint),
        ("planted_twin_caught", twinCaught))
        .toDF("property", "ok").orderBy("property")
    }),
    // re-estimate alternations from the deterministic %83 init, the
    // whole trajectory hash-oracled (per-iteration chained CTEs).
    // Scale note (VERDICT r13 #3): THIS KEY's init predicate derives k
    // from a fixed modulus, so k grows ∝ corpus and the assign stage is
    // O(N·k·D) — superlinear in the KEY by construction, linear in the
    // OPERATOR at fixed k (the real-world configuration; see
    // kmeansTrain's scaladoc). SPARK_GRAFT_KMEANS_MOD lets the sf1 lane
    // pin that with data: mod=830 at 10× data holds k constant and the
    // growth collapses to ~linear. Verify never sets it — the gate runs
    // the default %83, so the hash oracle is untouched.
    "kmeans_train" -> ((s, dir) => {
      val mod = sys.env.get("SPARK_GRAFT_KMEANS_MOD")
        .flatMap(v => scala.util.Try(v.toInt).toOption).filter(_ > 0)
        .getOrElse(83)
      Similarity.kmeansTrain(
        embeddings(s, dir), "vec_id", "embedding",
        initPred = col("vec_id") % mod === 0, iters = 3)
        .orderBy("iter", "centroid_id")
    }),
    // greedy k-center coreset (E225): Gonzalez farthest-point traversal
    // in the incremental O(kN) form — diversity selection over the
    // embedding space; trajectory fully hash-oracled step by step
    "kcenter_coreset" -> ((s, dir) =>
      Similarity.kcenterCoreset(
        embeddings(s, dir), "vec_id", "embedding", k = 8)
        .orderBy("step")),
    // E213: per-cluster z-scored embedding outliers — the noise screen
    // relative to local density, exact decimal mean/variance.
    "embedding_outliers" -> ((s, dir) =>
      Similarity.embeddingOutliers(
        embeddings(s, dir), "vec_id", "embedding",
        centroidPred = col("vec_id") % 83 === 0)
        .orderBy("vec_id")),
    // IVF ANN: deterministic coarse quantizer (centroids = vec_id % 83 == 0,
    // the knn_assign cell structure), 2-probe search, exact rescoring within
    // probed cells only — the scale path of similarity search
    "ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(
        embeddings(s, dir), "vec_id", "embedding",
        centroidPred = col("vec_id") % 83 === 0,
        queryPred = col("vec_id") % 97 === 0)
        .orderBy("query_id", "neighbor_id")),
    // E221: IVF search served from the PERSISTED index artifact —
    // build-once/query-many (VERDICT r12 task 5): centroids +
    // per-vector cell assignment live in parquet (StateStore row-count
    // sidecars included); the query pays probe + rescore joins only.
    // Built at most once per JVM+sf (pure function of the data), so
    // bench iteration 2's min reflects the artifact-served query path.
    // Results are bit-identical to ivf_topk — same FULL hash oracle.
    "ivf_from_index" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val path = Scratch.dir("graft_ivf", dir)
      if (graft.operators.Dedup.StateStore.rows(s, s"$path/assign").isEmpty)
        Similarity.writeIvfIndex(
          emb, "vec_id", "embedding", col("vec_id") % 83 === 0, path)
      Similarity.ivfTopK(
        emb, "vec_id", "embedding",
        centroidPred = col("vec_id") % 83 === 0,
        queryPred = col("vec_id") % 97 === 0,
        index = Some(Similarity.readIvfIndex(s, path)))
        .orderBy("query_id", "neighbor_id")
    }),
    // E228: SemDeDup served from the SAME persisted quantizer — the r14
    // sf10 lane measured the in-plan assignment as semdedup_execute's
    // superlinear stage (67.7 s at 100× data); artifact-served, the
    // assignment is a read + one broadcast cos recompute and the
    // within-cluster pairwise work stays linear (cluster size constant
    // under the rate-based predicate). Bit-identical verdicts — same
    // FULL hash oracle as semdedup_execute.
    "semdedup_from_index" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val path = Scratch.dir("graft_ivf", dir)
      if (graft.operators.Dedup.StateStore.rows(s, s"$path/assign").isEmpty)
        Similarity.writeIvfIndex(
          emb, "vec_id", "embedding", col("vec_id") % 83 === 0, path)
      Similarity.semDedupExecute(
        emb, "vec_id", "embedding",
        col("vec_id") % 83 === 0, threshold = 0.35,
        index = Some(Similarity.readIvfIndex(s, path)))
        .orderBy("vec_id")
    }),
    // E229: SSL-prototypes density pruning — per-cluster difficulty
    // rank on the 6-dp centroid cosine (hard = far from prototype),
    // keep the hardest 70% of every cluster; broadcast argmax
    // assignment + one bounded per-cluster window, no global sort
    "prototype_prune" -> ((s, dir) =>
      Similarity.prototypePrune(
        embeddings(s, dir), "vec_id", "embedding",
        centroidPred = col("vec_id") % 83 === 0, keepFrac = 0.7)
        .orderBy("vec_id")),
    // E229 served from the PERSISTED quantizer (the E228 pattern): the
    // in-plan |corpus|×|cents| assignment is the rate-based predicate's
    // superlinear stage; artifact-served it is a read + one broadcast
    // cos recompute. Bit-identical output — same FULL hash oracle.
    "prototype_prune_from_index" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val path = Scratch.dir("graft_ivf", dir)
      if (graft.operators.Dedup.StateStore.rows(s, s"$path/assign").isEmpty)
        Similarity.writeIvfIndex(
          emb, "vec_id", "embedding", col("vec_id") % 83 === 0, path)
      Similarity.prototypePrune(
        emb, "vec_id", "embedding",
        col("vec_id") % 83 === 0, keepFrac = 0.7,
        index = Some(Similarity.readIvfIndex(s, path)))
        .orderBy("vec_id")
    }),
    // E234: D4 selection — SemDeDup then SSL-prototypes pruning over
    // the survivors, both stages on ONE shared quantizer (served from
    // the persisted artifact, the scale path); the composition adds a
    // window over the verdict relation, not a second corpus pass
    "d4_select" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val path = Scratch.dir("graft_ivf", dir)
      if (graft.operators.Dedup.StateStore.rows(s, s"$path/assign").isEmpty)
        Similarity.writeIvfIndex(
          emb, "vec_id", "embedding", col("vec_id") % 83 === 0, path)
      Similarity.d4Select(
        emb, "vec_id", "embedding",
        col("vec_id") % 83 === 0, threshold = 0.35, keepFrac = 0.7,
        index = Some(Similarity.readIvfIndex(s, path)))
        .orderBy("vec_id")
    }),
    // E221 audit: (a) artifact-served ≡ in-plan recompute (ivf_topk
    // and hard_negatives_ann both); (b) split-build + batch append ≡
    // whole build (assignment is a pure per-vector function — the E205
    // merge property for the ANN lane); (c) the StateStore row-count
    // sidecars match the true relation counts.
    "ivf_from_index_audit" -> ((s, dir) => {
      import s.implicits._
      val emb = embeddings(s, dir).localCheckpoint(true)
      val base = Scratch.dir("graft_ivf_audit", dir)
      val cPred = col("vec_id") % 83 === 0
      val qPred = col("vec_id") % 97 === 0
      val (ncents, nassign) = Similarity.writeIvfIndex(
        emb, "vec_id", "embedding", cPred, s"$base/whole")
      val idx = Similarity.readIvfIndex(s, s"$base/whole")
      def eq(a: DataFrame, b: DataFrame): Boolean =
        a.exceptAll(b).count() + b.exceptAll(a).count() == 0L
      val fromIdx = Similarity.ivfTopK(
        emb, "vec_id", "embedding", cPred, qPred, index = Some(idx))
      val inPlan = Similarity.ivfTopK(emb, "vec_id", "embedding", cPred, qPred)
      val artifactEq = eq(fromIdx, inPlan)
      // hard-negatives parity: index over the label-filtered relation
      // (unlabeled vectors never enter that operator's index)
      val labeled = emb.where(col("label").isNotNull)
      Similarity.writeIvfIndex(
        labeled, "vec_id", "embedding", cPred, s"$base/labeled")
      val hnFromIdx = Similarity.hardNegativesAnn(
        emb, "vec_id", "embedding", "label", cPred, qPred,
        index = Some(Similarity.readIvfIndex(s, s"$base/labeled")))
      val hnInPlan = Similarity.hardNegativesAnn(
        emb, "vec_id", "embedding", "label", cPred, qPred)
      val hnEq = eq(hnFromIdx, hnInPlan)
      // split-build + append ≡ whole build: the quantizer is FIXED at
      // initial build (append assigns against persisted centroids, it
      // never extends them), so the reference is a whole-corpus build
      // over the SAME centroid set — the initial batch's
      val splitPred = cPred && col("vec_id") % 2 === 0
      Similarity.writeIvfIndex(
        emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
        splitPred, s"$base/split")
      val nAfter = Similarity.appendIvfIndex(
        emb.where(col("vec_id") % 2 =!= 0), "vec_id", "embedding",
        s"$base/split")
      Similarity.writeIvfIndex(
        emb, "vec_id", "embedding", splitPred, s"$base/ref")
      val refIdx = Similarity.readIvfIndex(s, s"$base/ref")
      val splitIdx = Similarity.readIvfIndex(s, s"$base/split")
      val appendEq = eq(splitIdx._2, refIdx._2) && nAfter == refIdx._2.count()
      val metaOk =
        graft.operators.Dedup.StateStore.rows(s, s"$base/whole/centroids")
          .contains(idx._1.count()) &&
          graft.operators.Dedup.StateStore.rows(s, s"$base/whole/assign")
            .contains(idx._2.count()) &&
          ncents == idx._1.count() && nassign == idx._2.count()
      Seq(
        ("append_equals_whole", appendEq),
        ("artifact_equals_inplan", artifactEq),
        ("hard_negatives_from_index_parity", hnEq),
        ("meta_counts_match", metaOk))
        .toDF("property", "ok").orderBy("property")
    }),
    // simplified silhouette (E201): per cluster, mean + worst member
    // (b-a)/max(a,b) against own vs nearest-other centroid — the
    // internal clustering-quality measure beside E200's external purity
    "silhouette" -> ((s, dir) =>
      Similarity.silhouette(
        embeddings(s, dir), "vec_id", "embedding",
        col("vec_id") % 83 === 0)
        .orderBy("centroid_id")),
    // kNN label probe (E199): leave-one-out majority vote over the
    // brute-force top-10 — the no-training embedding-quality eval
    "knn_label_eval" -> ((s, dir) =>
      Similarity.knnLabelEval(
        embeddings(s, dir), "vec_id", "embedding", "label",
        col("vec_id") % 97 === 0)
        .orderBy("query_id")),
    // KNN-Shapley data valuation (E252): exact closed-form Shapley of
    // every training vector for the K-NN classifier over the %97 test
    // slice — rank-suffix-sum per test point, decimal-exact cross-test
    // mean; the model-free valuation face of the attribution shelf
    "knn_shapley" -> ((s, dir) =>
      Similarity.knnShapley(
        embeddings(s, dir), "vec_id", "embedding", "label",
        col("vec_id") % 97 === 0)
        .orderBy("vec_id")),
    // cluster label purity (E200): per nearest-centroid cluster, the
    // majority label + purity fraction — do the IVF cells respect
    // semantics
    "cluster_purity" -> ((s, dir) =>
      Similarity.clusterPurity(
        embeddings(s, dir), "vec_id", "embedding", "label",
        col("vec_id") % 83 === 0)
        .orderBy("centroid_id")),
    // MMR diversified re-rank (E193): greedy maximal marginal relevance
    // over the brute-force pool — selection keys 6-dp, chained stages,
    // query-parallel (no driver loop over queries)
    "mmr_diversify" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val pool = Similarity.cosineTopK(
        emb, "vec_id", "embedding", col("vec_id") % 97 === 0)
      Similarity.mmrDiversify(
        pool, emb, "query_id", "neighbor_id", "cos", "vec_id", "embedding")
        .orderBy("query_id", "rank")
    }),
    // ANN recall curve (E194): recall@k for k=1..10 of the IVF run vs
    // the exact top-k — mean and worst-query recall per k
    "recall_curve" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val sys = Similarity.ivfTopK(
        emb, "vec_id", "embedding",
        centroidPred = col("vec_id") % 83 === 0,
        queryPred = col("vec_id") % 97 === 0)
      val ex = Similarity.cosineTopK(
        emb, "vec_id", "embedding", col("vec_id") % 97 === 0)
      graft.operators.Search.recallCurve(
        sys, ex, "query_id", "neighbor_id", "cos")
        .orderBy("k")
    }),
    // NDCG@10 eval (E189): the IVF run graded against the brute-force
    // top-10 pool (pooled-judgment semantics, unjudged gain 0); rank
    // discounts are precomputed literals, terms decimal-summed
    "ndcg_eval" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val sys = Similarity.ivfTopK(
        emb, "vec_id", "embedding",
        centroidPred = col("vec_id") % 83 === 0,
        queryPred = col("vec_id") % 97 === 0)
      val pool = Similarity.cosineTopK(
        emb, "vec_id", "embedding", col("vec_id") % 97 === 0)
      graft.operators.Search.ndcgAtK(
        sys, pool, "query_id", "neighbor_id", "cos", "cos")
        .orderBy("query_id")
    }),
    // int8 scalar quantization report per embedding vector
    "embedding_quantize" -> ((s, dir) =>
      graft.operators.Quantize.int8Scalar(embeddings(s, dir), "vec_id", "embedding")
        .orderBy("vec_id")),
    // reciprocal-rank fusion (E113) of three independent rankings
    "rrf_fuse" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, dir)
      def ranked(key: org.apache.spark.sql.Column) = docs
        .select(col("doc_id"), key.as("k"))
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("k").desc_nulls_last, col("doc_id").asc)).as("rank"))
      graft.operators.Search.rrfFuse(
        Seq(
          ranked(round(TextFunctions.qualityScore(col("text")), 6)),
          ranked(col("n_chars")),
          ranked(TextFunctions.wsTokenCount(col("text")))),
        "doc_id", "rank", k0 = 60, k = 30)
    }),
    // one deterministic Lloyd half-step: per-cell per-dim DECIMAL-exact
    // means of the nearest-centroid assignment (closes E35's re-estimation
    // exclusion — decimal quantization makes the mean order-independent)
    "centroid_update" -> ((s, dir) =>
      Similarity.centroidUpdate(
        embeddings(s, dir), "vec_id", "embedding", col("vec_id") % 83 === 0)
        .orderBy("centroid_id", "dim")),
    // embedding-corpus QA: dims consistency, zero-norm count, norm stats
    "embedding_stats" -> ((s, dir) =>
      Similarity.corpusStats(embeddings(s, dir), "embedding")),
    // E7: recall < 1 by design, but three invariants are exact: the i-th
    // best LSH cosine can never exceed the i-th best brute-force cosine
    // (a sorted subset is pointwise dominated), every LSH rank must exist
    // in the brute-force ranking, and every emitted cosine must equal the
    // exact 6-dp cosine recomputed from the raw vectors.
    "ann_lsh_audit" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val emb = embeddings(s, dir)
      val pred = col("vec_id") % 97 === 0
      val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", pred).persist()
      try {
        val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", pred)
        val w = Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id").asc)
        val lr = lsh.withColumn("rn", row_number().over(w))
        val br = brute.withColumn("rn", row_number().over(w))
        val dominated = lr.alias("l")
          .join(br.alias("b"), Seq("query_id", "rn"))
          .where(col("l.cos") > col("b.cos")).count() == 0L
        val allRanked = lr.join(br, Seq("query_id", "rn"), "left_anti").count() == 0L
        val qv = emb.where(pred)
          .select(col("vec_id").as("query_id"), col("embedding").as("q"))
        val nv = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("v"))
        val cosExact = lsh.join(qv, "query_id").join(nv, "neighbor_id")
          .where(col("cos") =!= round(Similarity.cosine(col("q"), col("v")), 6))
          .count() == 0L
        Seq(
          ("cos_exact_recompute", cosExact),
          ("rank_dominance", dominated),
          ("ranks_in_bruteforce", allRanked))
          .toDF("property", "ok").orderBy("property")
      } finally { lsh.unpersist(); () }
    })
  )
}
