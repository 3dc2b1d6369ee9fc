package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic (embedding-space) deduplication, the
  * cluster-then-compare family from Abbas et al. 2023
  * (arXiv:2303.09540): partition the corpus into embedding clusters,
  * connect every within-cluster pair whose cosine similarity reaches
  * `tau`, and keep ONE representative per connected group. Where
  * MinHash/Jaccard dedup ([[Dedup.minhashNearDups]]) removes
  * near-identical TEXT, SemDeDup removes semantically redundant
  * documents whose wording differs — the complementary signal, and the
  * last well-known LLM-curation dedup family alongside exact, fuzzy,
  * and decontamination.
  *
  * Clustering is a parameter, exactly as in the paper (which trains
  * k-means offline and dedups within cells):
  *   - [[withClusters]] takes an EXISTING cluster column — a k-means
  *     cell id, a taxonomy label, a shard key. This is the
  *     oracle-checkable core (q99 runs it over the `label` column,
  *     which DuckDB can reproduce; a trained clustering is
  *     float-iteration-dependent and cannot hash-match across
  *     engines).
  *   - [[semanticDedup]] is the paper's full form: spherical k-means
  *     via [[Ivf.trainCentroids]], then the same core within the
  *     learned cells (SemDedupSpec grades it on planted clusters).
  *
  * Scale shape: the within-cluster pair join is an equi-join on the
  * cluster key — each vector shuffles ONCE per side, pairs are formed
  * inside the join and flow straight into the codegen'd
  * [[Similarity.cosineFast]] filter, never shuffled as pairs. The
  * quadratic term is Σ|cluster|², the paper's own cost model: nClusters
  * must grow with the corpus so cells stay bounded (the paper uses 50k
  * cells for 100M+ docs; at 100 TB pick nClusters ≈ corpus/10⁵..10⁶).
  * The component resolution is [[Components.dedupGroups]]'s O(log n)
  * large-star/small-star rounds over the (tiny) tau-pair set, and the
  * final survivor join broadcasts via AQE because only docs WITH a
  * semantic dup appear in it.
  *
  * Cosine ties at the threshold are decided on `round(cos, 6)` (the
  * q39/q72 idiom) so a last-ulp difference between engines or plans
  * cannot flip membership.
  */
object SemDedup {

  /** Semantic dedup within PRE-ASSIGNED clusters: every id mapped to
    * the canonical survivor (min id) of its within-cluster cosine-
    * component, itself when it has no semantic dup. Output:
    * (`idCol`, keep_id) — one row per input row, the q69 contract. */
  def withClusters(embeddings: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      clusterCol: String = "label"): DataFrame = {
    val x = embeddings.select(col(clusterCol).as("__c"),
      col(idCol).as("a"), col(vecCol).as("va"))
    val y = embeddings.select(col(clusterCol).as("__c"),
      col(idCol).as("b"), col(vecCol).as("vb"))
    val pairs = x.join(y, Seq("__c"))
      .filter(col("a") < col("b"))
      .filter(round(Similarity.cosineFast(col("va"), col("vb")), 6) >= tau)
      .select(col("a"), col("b"))
    Components.dedupGroups(embeddings.select(col(idCol)), pairs)
  }

  /** The paper's full pipeline: spherical k-means over the embeddings
    * (deterministic seeding and sampling — [[Ivf.trainCentroids]]),
    * then [[withClusters]] within the learned cells. `trainFraction`
    * caps the k-means sample; assignment still covers every row. */
  def semanticDedup(embeddings: DataFrame, tau: Double, nClusters: Int,
      iters: Int = 3, trainFraction: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = Ivf.trainCentroids(embeddings, nClusters, iters,
      trainFraction, idCol, vecCol)
    // Raw float column into assignCluster — simsToCentroids casts
    // per-element inside its lambdas (like every Ivf call site); a
    // transform(cast) wrapper here would re-materialize the double
    // array once per centroid reference (the HOF-binding trap).
    // The groupBy(id) barrier is the minhashSignatures lesson: the
    // cluster column is EXPENSIVE (k dot-products per row), and
    // withClusters' self-join would otherwise recompute it on both
    // sides (differently-aliased projections defeat ReusedExchange).
    // Ids are unique by contract (an embedding table key), so
    // first() is a no-op on values.
    val clustered = embeddings.select(col(idCol), col(vecCol),
      Ivf.assignCluster(centroids, col(vecCol)).as("__cell"))
      .groupBy(col(idCol))
      .agg(first(col(vecCol)).as(vecCol), first(col("__cell")).as("__cell"))
    withClusters(clustered, tau, idCol, vecCol, clusterCol = "__cell")
  }
}
