package graft

import org.apache.spark.sql.Row

/** Golden-fixture tests from the reference's own literals (FIXTURES.md;
  * SURVEY.md §5 item 2/4).
  */
class GoldenSpec extends SparkSpec {

  test("order JSON map values sum to exactly 1236.70 (tutorial_dag.py:73-77)") {
    val Row(total: Double) =
      SparkEntry.queries("q22_golden_orders")(spark, sfDir).head()
    assert(total == 1236.70)
  }

  test("flagship entry returns rows on sf0.001 (driver smoke contract)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    // TPC-H-ish pricing summary: grouped by (returnflag, linestatus),
    // counts must be positive and quantities non-negative.
    rows.foreach { r =>
      assert(r.getAs[Long]("count_order") > 0)
      assert(r.getAs[Double]("sum_qty") >= 0.0)
    }
  }

  test("every QueryDef runs on sf0.001 and declared oracle columns align") {
    SparkEntry.all.foreach { q =>
      val df = q.fn(spark, sfDir)
      // Schema must resolve (analysis) and execute without error.
      val n = df.limit(5).collect().length
      assert(n >= 0, s"${q.name} failed to execute")
      assert(df.columns.distinct.length == df.columns.length,
        s"${q.name} has duplicate output columns: ${df.columns.mkString(",")}")
    }
  }

  test("query names are unique and oracle SQL non-empty where declared") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.length == names.length, "duplicate query names")
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k: empty oracle SQL")
    }
  }
}
