package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** As-of join edge semantics (J5): inclusive simultaneous match,
  * no-match null, per-key isolation, deterministic tie-break. */
class AsOfSpec extends SparkSpec {

  test("asof: inclusive at equal ts, null before first right row, key-isolated") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 250L), (4L, 20L, 50L))
      .toDF("event_id", "user_id", "ts")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"))
    val right = Seq(
      (10L, 200L, 7.0), (10L, 200L, 9.0), // duplicate ts -> tieBreak max = 9.0
      (10L, 240L, 3.0),
      (20L, 100L, 5.0))
      .toDF("user_id", "ts", "value")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
    val got = AsOf.join(left, right, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(got(1L).isEmpty)          // ts=100: before any right row -> null
    assert(got(2L).contains(9.0))    // ts=200: equal ts inclusive, tie-broken to max
    assert(got(3L).contains(3.0))    // ts=250: latest right <= 250 is ts=240 -> 3.0
    assert(got(4L).isEmpty)          // user 20 at ts=50: its right row is at 100
  }

  test("asof: later right row supersedes earlier one") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, 300L)).toDF("event_id", "user_id", "ts")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"))
    val right = Seq((10L, 100L, 1.0), (10L, 250L, 2.0))
      .toDF("user_id", "ts", "value")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
    val got = AsOf.join(left, right, "user_id", "ts", "value").head()
    assert(got.getDouble(3) == 2.0)
  }
}
