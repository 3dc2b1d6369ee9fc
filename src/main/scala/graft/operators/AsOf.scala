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
    // internal columns must not shadow (and silently clobber) caller
    // columns of the same name — grow until collision-free, the
    // Ranges.binnedRangeJoin idiom (e.g. this join's own output fed
    // back in would otherwise collide on the value column)
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken).next()
    val vCol = fresh("__asof_value")
    val sideCol = fresh("__is_left")
    val filledCol = fresh("__filled")
    // Deterministic right side: one row per (key, ts).
    val r = right.groupBy(col(keyCol), col(tsCol))
      .agg(tieBreak(col(valueCol)).as(vCol))
      .withColumn(sideCol, lit(0))
    val leftCols = left.columns
    val l = left.withColumn(vCol, lit(null).cast(r.schema(vCol).dataType))
      .withColumn(sideCol, lit(1))
    val unioned = l.select((leftCols.map(col) :+ col(vCol) :+ col(sideCol)): _*)
      .unionByName(r.select(
        (leftCols.map(c => if (c == keyCol || c == tsCol) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))
          :+ col(vCol) :+ col(sideCol)): _*))
    // Right rows sort before left rows at the same timestamp, so an
    // exactly-simultaneous right value IS visible to the left row
    // (the `<=` in the contract).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(sideCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(filledCol, last(col(vCol), ignoreNulls = true).over(w))
      .filter(col(sideCol) === 1)
      .select((leftCols.map(col) :+ col(filledCol).as(s"asof_$valueCol")): _*)
  }
}
