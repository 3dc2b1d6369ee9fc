package graft

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Boundary semantics the oracle data never happens to exercise:
  * the exact-gap session edge and width_bucket's range edges. These
  * pin the semantics so a refactor that flips an inequality fails a
  * unit test even when the synthetic corpus wouldn't notice.
  */
class BoundarySpec extends SparkSpec {

  test("session gap of exactly 30 minutes does NOT start a new session") {
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(mins: Long) = new Timestamp(t0.getTime + mins * 60000L)
    val events = Seq(
      (1L, 1L, t0),
      (1L, 2L, plus(30)),      // gap == 30min → SAME session (strict >)
      (1L, 3L, plus(61)),      // gap 31min   → new session
      (1L, 4L, plus(121)))     // gap 60min   → new session
      .toDF("user_id", "event_id", "ts")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(w)
    val sess = events.withColumn("new_sess",
        when(prev.isNull || col("ts") > prev + expr("interval 30 minutes"), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("session_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("width_bucket matches its SQL-standard definition on every edge") {
    val s = spark
    import s.implicits._
    // q71's oracle spells the definition out manually (DuckDB lacks the
    // builtin); this pins Spark's builtin to that spelled-out form on
    // underflow, every internal edge, and overflow.
    val xs = (-60L to 660L by 30L) :+ 599L :+ 1L :+ -1L
    val got = xs.toDF("x").select(col("x"),
        width_bucket(col("x").cast("double"), lit(0.0), lit(600.0), lit(12L)).as("wb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val manual = if (x < 0) 0L else if (x >= 600) 13L else 1L + x / 50
      assert(got(x) == manual, s"x=$x got=${got(x)} manual=$manual")
    }
  }
}
