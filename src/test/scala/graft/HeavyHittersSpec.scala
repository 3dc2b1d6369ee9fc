package graft

import scala.collection.mutable
import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters
import graft.functions.Text

/** Misra–Gries sketch-then-recount top-k ([[operators.HeavyHitters]]):
  * the sketch's underestimate bound and survival guarantee (exercising
  * the compaction path the test corpus is too small to trigger), the
  * exactness certificate, and end-to-end equality with the exact
  * groupBy spelling on the real documents table.
  */
class HeavyHittersSpec extends SparkSpec {

  /** Drive the aggregator directly (no Spark) over a partitioned stream,
    * mimicking partial aggregation + a merge tree. */
  private def sketch(parts: Seq[Seq[String]], m: Int): Map[String, Long] = {
    val agg = new HeavyHitters.MisraGries(m)
    val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    val merged = partials.reduceLeft(agg.merge)
    val s = agg.finish(merged)
    s.keys.zip(s.counts).toMap
  }

  test("sketch bound: underestimates only, error <= N/(m+1), heavy keys survive compaction") {
    val m = 16
    // Adversarial: 4000 distinct singletons (forces many compactions at
    // cap 2m=32) hiding 3 heavy keys. Deterministic construction.
    val heavy = Map("alpha" -> 400L, "beta" -> 250L, "gamma" -> 90L)
    val stream = mutable.ArrayBuffer[String]()
    for (k <- 0 until 4000) {
      stream += s"noise_$k"
      for ((h, c) <- heavy) { // interleave heavy keys evenly
        val stride = 4000 / c.toInt
        if (stride > 0 && k % stride == 0) stream += h
      }
    }
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val bound = n.toDouble / (m + 1)

    // 7 uneven partitions → a real merge tree.
    val parts = stream.grouped(math.max(1, stream.size / 7 + 3)).map(_.toSeq).toSeq
    val est = sketch(parts, m)

    assert(est.size <= 2 * m, s"summary must stay <= 2m entries, got ${est.size}")
    est.foreach { case (k, v) =>
      assert(v <= truth(k), s"$k overestimated: $v > ${truth(k)}")
      assert(truth(k) - v <= bound + 1e-9, s"$k error ${truth(k) - v} > bound $bound")
    }
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(est.contains(k), s"heavy key $k (count ${truth(k)} > bound $bound) evicted")
    }
    // The construction really exercised compaction.
    assert(truth.size > 2 * m, "test stream must exceed summary capacity")
  }

  test("topKExact equals the exact groupBy spelling and certifies itself on documents") {
    val d = sources.Tables.load(spark, sfDir, "documents")
    val grams = d.select(Text.tokens(col("text")).as("toks"))
      .select(explode(Text.wordNgrams(col("toks"), 3)).as("ngram"))

    // sf0.001 trigrams: N ≈ 27k, 20th count 6 → m = 8192 puts the
    // evasion bound at ~3.3, strictly under the k-th count.
    val m = 8192
    val k = 20
    val topk = HeavyHitters.topKExact(grams, "ngram", k, m)
    val viaSketch = topk.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = grams.groupBy(col("ngram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram")).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSketch == exact)

    val cert = HeavyHitters.certificate(grams, topk, k, m).collect()(0)
    assert(cert.getAs[Boolean]("proven"),
      s"certificate must hold at this (k=$k, m=$m) on sf0.001: $cert")
  }

  test("certificate refuses a result with fewer than k rows unless the bound closes it") {
    val s = spark
    import s.implicits._
    // m=1, k=2 over [a,a,a,b,c]: compaction (t=1 at size 3) drains the
    // summary to {a}, so topKExact returns ONE row [(a,3)] while the
    // exact spelling has two. kth=3 > bound=2.5 — the pre-fix
    // certificate would have claimed proven on a wrong result.
    val items = Seq("a", "a", "a", "b", "c").toDF("key").coalesce(1)
    val top = HeavyHitters.topKExact(items, "key", k = 2, m = 1)
    val rows = top.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    if (rows.size < 2) {
      val cert = HeavyHitters.certificate(items, top, k = 2, m = 1).collect()(0)
      assert(!cert.getAs[Boolean]("proven"),
        s"a short result with evaded keys must not certify: $cert")
    } else {
      // Partial-aggregation splits can legitimately keep both b and c
      // alive (per-partition summaries), making the result exact — in
      // that case the bound<1 arm must NOT fire (bound is 2.5).
      assert(rows == Seq(("a", 3L), ("b", 1L)) || rows == Seq(("a", 3L), ("c", 1L)))
    }
    // The bound<1 arm: m large enough that NO key can evade — a
    // short result is then provably complete.
    val cert2 = HeavyHitters.certificate(items,
      HeavyHitters.topKExact(items, "key", k = 10, m = 64), k = 10, m = 64)
      .collect()(0)
    assert(cert2.getAs[Long]("k_found") == 3L)
    assert(cert2.getAs[Boolean]("proven"),
      s"bound < 1 makes even a short result provably exact: $cert2")
  }

  test("ties at the cut keep the deterministic (count desc, key asc) order") {
    val s = spark
    import s.implicits._
    // 6 keys, counts 3/3/2/2/1/1 — the k=4 cut lands inside a tie.
    val items = Seq("b", "b", "b", "a", "a", "a", "d", "d", "c", "c", "f", "e")
      .toDF("key")
    val top = HeavyHitters.topKExact(items, "key", k = 4, m = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("a", 3L), ("b", 3L), ("c", 2L), ("d", 2L)))
  }

  test("topKCertified escalates an initially-too-small m to a proven result") {
    val s = spark
    import s.implicits._
    // 3 heavy keys over a 200-singleton tail: N = 470 + 200 = 670.
    // m=1 → bound 335 ≥ kth (80): unproven. Doublings: m=2 (223),
    // m=4 (134), m=8 (74): 80 > 74 → proven at the third doubling.
    val items = (Seq.fill(200)("a") ++ Seq.fill(190)("b") ++
      Seq.fill(80)("c") ++ (1 to 200).map(i => s"tail_$i")).toDF("key")
    val top = HeavyHitters.topKCertified(items, "key", k = 3, m = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("a", 200L), ("b", 190L), ("c", 80L)), s"got $top")
    // sanity: the starting m really was too small on its own
    val cert1 = HeavyHitters.certificate(items,
      HeavyHitters.topKExact(items, "key", k = 3, m = 1), k = 3, m = 1)
      .collect()(0)
    assert(!cert1.getAs[Boolean]("proven"))
    // and a distribution too flat to ever certify throws instead of
    // silently returning an unproven result
    val flat = (1 to 300).map(i => s"u_$i").toDF("key")
    val e = intercept[IllegalStateException] {
      HeavyHitters.topKCertified(flat, "key", k = 3, m = 1, maxDoublings = 2)
    }
    assert(e.getMessage.contains("doublings"))
  }

  test("a key column named n is refused (count-column collision)") {
    val s = spark
    import s.implicits._
    val items = Seq("a", "a", "b").toDF("n")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topKExact(items, "n", k = 2, m = 8)
    }
    assert(e.getMessage.contains("count column"))
  }
}
