package graft

import org.apache.spark.sql.functions._
import graft.operators.{SemDedup, Similarity}
import graft.sources.Tables

/** Contracts for SemDeDup ([[graft.operators.SemDedup]]):
  *   - the k-means form finds planted semantic duplicates and keeps
  *     exactly one representative per group (the paper's behavior);
  *   - clustering only SCOPES comparison — an above-tau pair split
  *     across cells is deliberately not connected;
  *   - the oracle-checked label form (q99) equals a direct
  *     all-pairs-within-label computation.
  */
class SemDedupSpec extends SparkSpec {

  /** Planted corpus: three tight direction-clusters in R^4, each with
    * a near-identical pair (cos > 0.99) plus a distinct member; ids
    * chosen so group mins are unambiguous. */
  private def planted = {
    val s = spark
    import s.implicits._
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    Seq(
      (10L, v(1, 0.02, 0, 0)), (11L, v(1, 0.03, 0, 0)),   // dup pair A
      (12L, v(0.5, 0.86, 0, 0)),                          // A's cluster, distinct
      (20L, v(0, 0, 1, 0.02)), (21L, v(0, 0, 1, 0.03)),   // dup pair B
      (22L, v(0, 0.86, 0.5, 0)),                          // B's cluster, distinct
      (30L, v(0, 0.02, 0, 1)), (31L, v(0.03, 0, 0, 1)),   // dup pair C
      (32L, v(0.86, 0, 0.5, 0))                           // C's cluster, distinct
    ).toDF("vec_id", "embedding")
  }

  test("k-means form keeps one representative per planted dup group") {
    val got = SemDedup.semanticDedup(planted, tau = 0.99, nClusters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      10L -> 10L, 11L -> 10L, 12L -> 12L,
      20L -> 20L, 21L -> 20L, 22L -> 22L,
      30L -> 30L, 31L -> 30L, 32L -> 32L), s"got $got")
    // survivors = distinct keep_ids: exactly one per dup pair + the
    // three unique docs
    assert(got.values.toSet.size == 6)
  }

  test("clustering scopes comparison: a cross-cell pair stays unconnected") {
    val s = spark
    import s.implicits._
    // identical vectors planted in DIFFERENT clusters: within-cluster
    // semantics must NOT merge them (that is the approximation SemDeDup
    // trades for never comparing across cells)
    val e = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 1),
      (3L, Array(0f, 1f), 0), (4L, Array(0f, 1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = SemDedup.withClusters(e, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L), s"got $got")
  }

  test("dedup is idempotent: survivors contain no remaining tau-pairs") {
    // Within one cluster, two DIFFERENT components cannot hold a
    // >= tau pair (it would have connected them), so filtering to
    // survivors and re-running under the same clustering must be the
    // identity mapping. Pinned on the real corpus.
    val e = Tables.load(spark, sfDir, "embeddings")
    val first = SemDedup.withClusters(e, tau = 0.45)
    val survivors = e.join(
      first.filter(col("vec_id") === col("keep_id")).select(col("vec_id")),
      Seq("vec_id"))
    val second = SemDedup.withClusters(survivors, tau = 0.45)
    assert(second.filter(col("vec_id") =!= col("keep_id")).isEmpty,
      "second pass found pairs among survivors")
    assert(second.count() == survivors.count())
  }

  test("label form equals direct within-label all-pairs components (q99 core)") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val got = SemDedup.withClusters(e, tau = 0.45)
    // independent spelling: within-label pairs via a plain self-join,
    // grouped through the same component resolver
    val x = e.select(col("label"), col("vec_id").as("a"), col("embedding").as("va"))
    val y = e.select(col("label"), col("vec_id").as("b"), col("embedding").as("vb"))
    val pairs = x.join(y, Seq("label")).filter(col("a") < col("b"))
      .filter(round(Similarity.cosine(
        transform(col("va"), v => v.cast("double")),
        transform(col("vb"), v => v.cast("double"))), 6) >= 0.45)
      .select(col("a"), col("b"))
    val expect = graft.operators.Components.dedupGroups(
      e.select(col("vec_id")), pairs)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "label-clustered SemDeDup diverged from the direct spelling")
    // every id appears exactly once
    assert(got.count() == e.count())
  }
}
