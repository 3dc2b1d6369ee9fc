package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sketch-based aggregates vs their exact siblings — the accuracy
  * contract behind PLANS.md's "prefer sketches at 100 TB" guidance.
  * (approx_count_distinct's ≤5% bound lives in DedupSpec.) */
class SketchSpec extends SparkSpec {

  test("approx_percentile tracks exact percentile within its accuracy bound") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"),
        count(lit(1)).as("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Double]("exact")
      val approx = r.getAs[Double]("approx")
      // accuracy=10000 → rank error ≤ n/10000; on this distribution that
      // translates to well under 2% relative value error
      assert(math.abs(approx - exact) / math.max(math.abs(exact), 1e-9) < 0.02,
        s"group ${r.get(0)}: exact=$exact approx=$approx")
    }
  }

  test("approx_percentile array form returns ordered quantiles") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val q = li.agg(approx_percentile(col("l_quantity"),
        array(lit(0.1), lit(0.5), lit(0.9)), lit(1000)).as("qs"))
      .head().getSeq[Double](0)
    assert(q.length == 3 && q(0) <= q(1) && q(1) <= q(2))
  }
}
