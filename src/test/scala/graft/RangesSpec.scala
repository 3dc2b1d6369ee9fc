package graft

import org.apache.spark.sql.functions._
import graft.operators.Ranges

/** Binned range join: semantics identical to the nested-loop reference,
  * including half-open boundaries, bin-spanning intervals, and empty
  * intervals. */
class RangesSpec extends SparkSpec {

  test("binned == naive on adversarial intervals, boundaries half-open") {
    val s = spark
    import s.implicits._
    val pts = Seq(0L, 5L, 9L, 10L, 11L, 19L, 20L, 25L, 99L, 100L, 101L)
      .toDF("pt").withColumn("pid", col("pt"))
    val ivs = Seq(
      (1L, 10L, 20L),   // aligned to one bin (width 10)
      (2L, 5L, 25L),    // spans three bins
      (3L, 15L, 15L),   // empty: matches nothing
      (4L, 99L, 101L),  // spans a bin edge
      (5L, 0L, 1L)      // single-point-wide
    ).toDF("iid", "lo", "hi")

    val got = Ranges.binnedRangeJoin(pts, "pt", ivs, "lo", "hi", binWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Ranges.naiveRangeJoin(pts, "pt", ivs, "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // spot-check the half-open contract: hi excluded, lo included
    assert(got.contains((10L, 1L)) && !got.contains((20L, 1L)))
    assert(got.contains((0L, 5L)) && !got.contains((1L, 5L)))
    assert(!got.exists(_._2 == 3L), "empty interval matched a point")
  }

  test("property: binned == naive for random intervals and bin widths") {
    import org.scalacheck.{Gen, Prop}
    val s = spark
    import s.implicits._
    // negative points included: truncating division would mis-bin them
    val pts = Seq.tabulate(60)(i => (i * 3L) % 100 - 50).distinct.toDF("pt")
    val genCase = for {
      width <- Gen.choose(1L, 40L)
      ivs <- Gen.listOfN(6, for {
        lo <- Gen.choose(-60L, 100L)
        len <- Gen.choose(0L, 50L)
      } yield (lo, lo + len))
    } yield (width, ivs)
    val prop = Prop.forAll(genCase) { case (width, ivsList) =>
      val ivs = ivsList.zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val got = Ranges.binnedRangeJoin(pts, "pt", ivs, "lo", "hi", width)
        .select("pt", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = Ranges.naiveRangeJoin(pts, "pt", ivs, "lo", "hi")
        .select("pt", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("a caller-owned _bin column survives untouched") {
    val s = spark
    import s.implicits._
    val pts = Seq((5L, 42L), (25L, 43L)).toDF("pt", "_bin")
    val ivs = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    val out = Ranges.binnedRangeJoin(pts, "pt", ivs, "lo", "hi", binWidth = 10L)
    assert(out.columns.count(_ == "_bin") == 1, "internal bin column leaked")
    val rows = out.select("pt", "_bin", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only pt=5 is inside [0,10); its _bin value must be the caller's 42,
    // not the internal bin id (0) — and must not have been dropped
    assert(rows == Set((5L, 42L, 1L)))
  }

  test("binned join is an equi-join, not a nested loop") {
    val s = spark
    import s.implicits._
    val pts = Seq.tabulate(100)(i => i.toLong).toDF("pt")
    val ivs = Seq((0L, 10L), (50L, 60L)).toDF("lo", "hi")
    val plan = Ranges.binnedRangeJoin(pts, "pt", ivs, "lo", "hi", binWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned range join fell back to a nested loop:\n$plan")
  }
}
