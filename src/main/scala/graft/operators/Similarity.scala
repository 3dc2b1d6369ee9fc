package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline and a random-
  * hyperplane-LSH bucketed variant as the 100 TB scale path.
  *
  * All vector math is `zip_with`/`aggregate` over array columns —
  * declarative Catalyst expressions, not UDFs — computed in double
  * with a fixed left-to-right reduction so results are deterministic
  * across partitionings and engines.
  */
object Similarity {

  /** Sequential dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm vectors (never NaN/null).
    * Composable reference form — bit-identical to [[cosineFast]]. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm(a); val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** Cosine via the native codegen expression
    * [[graft.functions.CosineFloat]]: one fused loop per pair instead
    * of HigherOrderFunction lambda frames — the hot-path form used by
    * the top-k/ANN operators. Same double math, same results. Built
    * directly from the expression (not a `call_function("cosine_f")`
    * registry lookup) so it works on ANY SparkSession, not just ones
    * that ran [[graft.Session]]'s injectFunction hook; the SQL-name
    * registration stays for `expr("cosine_f(…)")` users (exercised by
    * q29). */
  def cosineFast(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.functions.CosineFloat(
        org.apache.spark.sql.GraftColumn.expr(a),
        org.apache.spark.sql.GraftColumn.expr(b)))

  /** Exact top-k nearest neighbours by cosine for each query vector.
    *
    * The query set is broadcast (it is small by construction — a batch
    * of probes); the corpus streams through one scan. The only shuffle
    * is the per-query top-k, which Catalyst runs as partial top-k per
    * partition then merge (rank ≤ k window over a broadcast-joined
    * scan). Exact, and at 100 TB exactly one pass over the data —
    * the right baseline to grade ANN recall against.
    *
    * Output: (query_id, neighbor_id, rank, cos) with rank 1 = nearest;
    * ties broken by neighbor id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFast(col("cvec"), col("qvec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** JL-prefiltered approximate top-k — the prefilter→rescore pattern
    * production ANN actually runs: quantize ([[Quantize.codes]]),
    * project to `outDim` integer coordinates ([[Quantize.jlProject]]),
    * shortlist `nCand` candidates per query by squared L2 distance in
    * the PROJECTED space (pure integer arithmetic — the shortlist is
    * exactly reproducible on any engine, so the whole operator is
    * oracle-checkable end-to-end, unlike hash/cluster ANN whose
    * bucketing is engine-specific), then exact-cosine rescore only the
    * shortlist.
    *
    * Scale shape: the distance pass streams the corpus as `outDim`
    * small integers per row — |Σ ±code| ≤ 255·dim fits int16, so a
    * persisted 16-dim projection is 32 bytes against the 64-dim
    * float input's 256 (8× fewer scan bytes; the in-flight longs
    * here are a 2× saving) — against
    * a broadcast query batch (the [[bruteForceTopK]] BNLJ shape, but
    * over the skinny projection); the rescore touches nCand × queries
    * vectors only. At production scale the projected table is
    * materialized once (it is the index artifact — a seed and a
    * parquet of longs) and reused by every probe batch.
    *
    * Output: (query_id, neighbor_id, rank, cos), rank ≤ k. Recall vs
    * [[bruteForceTopK]] is graded in QuantizeSpec; raise `outDim` /
    * `nCand` for more. */
  def jlPrefilterTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCand: Int, dim: Int, outDim: Int, seed: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nCand >= k, s"nCand $nCand must be >= k $k")
    def projected(df: DataFrame, outId: String, pre: String): DataFrame = {
      val staged = df.select(col(idCol), col(vecCol).as("vec"))
        .select(col(idCol), col("vec"),
          array_min(col("vec")).cast("double").as("mn"),
          Quantize.scale(col("vec")).as("qs"))
        .select(col(idCol),
          Quantize.codes(col("vec"), col("mn"), col("qs")).as("codes"))
      staged.select(col(idCol).as(outId) +:
        Quantize.jlProject(col("codes"), dim, outDim, seed)
          .zipWithIndex.map { case (p, j) => p.as(s"$pre$j") }: _*)
    }
    val cp = projected(corpus, "neighbor_id", "c")
    val qp = projected(queries, "query_id", "q")
    val pdist = (0 until outDim)
      .map { j => val d = col(s"c$j") - col(s"q$j"); d * d }
      .reduce(_ + _)
    val shortlist = cp.join(broadcast(qp), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), pdist.as("pdist"))
      .withColumn("crank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("pdist"), col("neighbor_id"))))
      .filter(col("crank") <= nCand)
      .select(col("query_id"), col("neighbor_id"))
    val scored = shortlist
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec")),
        "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qvec"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosineFast(col("cvec"), col("qvec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** kNN majority-vote classification: predict each query vector's
    * label from its k nearest labeled corpus vectors (the label-
    * propagation / quality-classifier shape of training-data
    * pipelines — score unlabeled data by vote of its labeled
    * neighbors). Same scan shape as [[bruteForceTopK]] with the
    * neighbor label CARRIED THROUGH the top-k window, so no second
    * corpus join is needed; then one (query, label) vote count and a
    * deterministic argmax (most votes, ties to the smallest label).
    *
    * Scale shape: broadcast query batch × one corpus pass + partial
    * top-k per partition; the vote aggregate sees ≤ k rows per query.
    * For corpus-scale query sets swap the candidate stage for
    * [[annTopK]]'s bucketed join — the vote tail is identical.
    *
    * Output: (query_id, predicted, votes). */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cvec"), col(labelCol).as("nlabel"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("nlabel"),
        cosineFast(col("cvec"), col("qvec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val nn = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val votes = nn.groupBy(col("query_id"), col("nlabel"))
      .agg(count(lit(1)).as("votes"))
    val vw = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("nlabel"))
    votes.withColumn("rn", row_number().over(vw)).filter(col("rn") === 1)
      .select(col("query_id"), col("nlabel").as("predicted"), col("votes"))
  }

  /** Max cosine of every corpus vector against a broadcast probe set:
    * `(vec_id, max_cos)` — the candidate-screening primitive behind
    * semantic decontamination (drop training vectors too close to an
    * eval/benchmark embedding) and nearest-centroid diagnostics.
    *
    * Scale shape: the probe set broadcasts (eval sets are small by
    * construction — the q73 broadcast-eval story in embedding space);
    * the corpus streams through ONE scan, and because each corpus row
    * meets all probes inside its own partition, the per-vector max
    * partial-aggregates to one row per vector before the exchange.
    * `max` is order-independent, so unlike mean-reductions there is no
    * float-summation-order caveat. For probe sets too big to
    * broadcast, screen through [[annTopK]]'s bucketed join instead —
    * same output contract.
    *
    * Total over the corpus: an EMPTY probe set still yields one row
    * per corpus vector with `max_cos = 0.0` (the no-contamination
    * reading, matching the zero-vector convention) — a left join
    * against the broadcast keeps the corpus rows, where a plain cross
    * join would return nothing and a downstream "keep uncontaminated"
    * join would drop the whole corpus.
    */
  def maxCosineAgainst(corpus: DataFrame, probes: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cvec"))
    val p = probes.select(col(vecCol).as("pvec"))
    c.join(broadcast(p), lit(true), "left")
      .select(col("vec_id"), cosineFast(col("cvec"), col("pvec")).as("cos"))
      .groupBy(col("vec_id"))
      .agg(coalesce(max(col("cos")), lit(0.0d)).as("max_cos"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim d): xxhash64 of the pair, mapped to [-1, 1). Generated inside
    * codegen — no hyperplane matrix to ship or store. */
  private def planeComponent(p: Int, d: Column): Column =
    (xxhash64(lit(p), d).cast("double") / lit(Long.MaxValue.toDouble))

  /** ANN top-k: candidates = corpus vectors sharing any of the query's
    * LSH buckets across `tables` independent hash tables (multi-table
    * = the standard recall knob), then exact cosine + top-k within
    * candidates only.
    *
    * Scale shape: bucket assignment is a map-side expression; the
    * candidate join is an equi-join on (table, bucket) — shuffle keyed
    * by bucket, never corpus × queries. Recall vs [[bruteForceTopK]]
    * is graded in AnnSpec. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 6, tables: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          explode(array((0 until tables).map(t =>
            struct(lit(t).as("tbl"),
              // per-table planes: offset the plane index so tables are
              // independent hash families
              lshBucketOffset(col(vecCol), nPlanes, t * nPlanes).as("bucket"))): _*))
            .as("tb"))
        .select(col(id), col(vec), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val c = bucketed(corpus, "neighbor_id", "cvec")
    val q = bucketed(queries, "query_id", "qvec")
    val cand = c.join(q, Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("cvec"), col("qvec"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.select(col("query_id"), col("neighbor_id"),
        cosineFast(col("cvec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** All-pairs cosine near-duplicates above `tau`, sub-quadratic:
    * multi-table sign-random-projection LSH generates candidate pairs
    * (equi-join on (table, bucket) — never a nested-loop product), and
    * only candidates get the exact cosine + threshold verify. The
    * output therefore carries EXACT cosines; completeness is governed
    * by the (nPlanes, tables) recall knobs.
    *
    * Knob physics: per-plane collision probability for angle θ is
    * 1 − θ/π, per-table p^nPlanes, overall 1 − (1 − p^nPlanes)^tables.
    * At real near-dup thresholds (τ ≥ 0.8, θ ≤ 37°) a handful of
    * planes prunes aggressively; at weak thresholds (τ ≈ 0.45, as the
    * synthetic-corpus q39 calibration requires) planes must stay low
    * for recall, so the candidate set is dense — that is inherent to
    * random projections, not to this plan. CosineNearDupSpec grades
    * the defaults against the exact all-pairs pair set at sf0.001 and
    * sf0.01 (set equality, not just recall).
    *
    * Scale shape: bucket assignment is one map-side pass (tables ×
    * nPlanes × dim hashes per row, all codegen); the self equi-join
    * shuffles (table, bucket, id) triples — never vectors; vectors are
    * re-attached to the deduplicated candidate list by two hash joins
    * on id. At 100 TB nothing here is driver-side or all-pairs.
    */
  def cosineNearDupPairs(df: DataFrame, tau: Double,
      nPlanes: Int = 4, tables: Int = 24,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val bucketed = vecs.select(col("id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            lshBucketOffset(col("vec"), nPlanes, t * nPlanes).as("bucket"))): _*))
          .as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val cand = bucketed.as("x").join(bucketed.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    cand
      .join(vecs.toDF("a", "va"), "a")
      .join(vecs.toDF("b", "vb"), "b")
      .select(col("a"), col("b"), cosineFast(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Sign-random-projection bucket id: bit p = sign(v · r_(offset+p)).
    * Vectors within a small angle share a bucket with high probability;
    * the `offset` shifts the plane family so each hash table gets an
    * independent set of hyperplanes. */
  private def lshBucketOffset(vec: Column, nPlanes: Int, offset: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast("double") * planeComponent(offset + p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
}
