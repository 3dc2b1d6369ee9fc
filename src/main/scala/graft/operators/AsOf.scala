package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 J5): for every left row, the most recent
  * right row with `rightTs <= leftTs` within the same key — the
  * standard event-time enrichment ("price as of trade time").
  *
  * Spark has no built-in; the composition here is the union+window
  * formulation: tag both sides, union, and per key carry the latest
  * right payload forward with `last(_, ignoreNulls = true)` over a
  * time-ordered running frame, then keep only left rows.
  *
  * Scale shape: ONE shuffle (hash by key) + per-partition sort — the
  * same cost as a sort-merge join, with no range-explosion risk that a
  * theta-join (`l.ts >= r.ts`) formulation would have (that one is
  * quadratic per key). Skewed keys behave like any skewed groupBy
  * (AQE-splittable). Ties on (key, rightTs) are pre-reduced
  * deterministically by `tieBreak` so the result never depends on
  * partition order.
  */
object AsOf {

  /** @param left      left (probe) rows
    * @param right     right (reference) rows
    * @param keyCol    equality key on both sides
    * @param tsCol     event-time column name on both sides
    * @param valueCol  right-side column to carry to left rows
    * @param tieBreak  aggregate resolving duplicate (key, ts) right rows
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieBreak: Column => Column = max): DataFrame = {
    // Deterministic right side: one row per (key, ts).
    val r = right.groupBy(col(keyCol), col(tsCol))
      .agg(tieBreak(col(valueCol)).as("__asof_value"))
      .withColumn("__is_left", lit(0))
    val leftCols = left.columns
    val l = left.withColumn("__asof_value", lit(null).cast(r.schema("__asof_value").dataType))
      .withColumn("__is_left", lit(1))
    val unioned = l.select((leftCols.map(col) :+ col("__asof_value") :+ col("__is_left")): _*)
      .unionByName(r.select(
        (leftCols.map(c => if (c == keyCol || c == tsCol) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))
          :+ col("__asof_value") :+ col("__is_left")): _*))
    // Right rows sort before left rows at the same timestamp, so an
    // exactly-simultaneous right value IS visible to the left row
    // (the `<=` in the contract).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__filled", last(col("__asof_value"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select((leftCols.map(col) :+ col("__filled").as(s"asof_$valueCol")): _*)
  }
}
