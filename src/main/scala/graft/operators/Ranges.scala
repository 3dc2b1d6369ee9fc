package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins at scale.
  *
  * A naive point-in-interval join (`lo <= pt AND pt < hi`) has no
  * equi-key, so Spark plans BroadcastNestedLoopJoin — |points| ×
  * |intervals| comparisons, which is fine for a literal dim (q10) and
  * fatal for two large tables. The standard fix is BINNING: quantize
  * both sides to fixed-width bins, equi-join on the bin id, then apply
  * the exact predicate. A point lands in one bin; an interval explodes
  * into ceil(len/width) bins — candidates are only pairs sharing a bin,
  * so cost tracks bin co-occupancy, not the cross product.
  *
  * Pick `binWidth` near the typical interval length: much wider wastes
  * candidates (many intervals per bin), much narrower multiplies the
  * interval-side explode factor.
  */
object Ranges {

  /** Point-in-interval join via bin equi-join. `ptCol` (from `points`)
    * and `loCol`/`hiCol` (from `intervals`) are long-valued (epoch
    * seconds, ids, …); intervals are half-open `[lo, hi)`. Output =
    * all `points` columns + all `intervals` columns, one row per
    * (point, containing interval).
    */
  /** Floor division as integer arithmetic (`div` truncates toward
    * zero, which mis-bins negative values: -10 div 3 = -3 but -10
    * belongs to bin floor(-10/3) = -4). pmod's non-negative remainder
    * makes the numerator an exact multiple, so the `div` is exact. */
  private def floorDiv(e: String, w: Long): String =
    s"(($e - pmod($e, ${w}L)) div ${w}L)"

  def binnedRangeJoin(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // internal join key must not shadow (and later drop) a caller
    // column of the same name on EITHER side — grow until collision-free
    val taken = (points.columns ++ intervals.columns).toSet
    val bin = Iterator.iterate("_bin")(_ + "_").dropWhile(taken).next()
    val p = points.withColumn(bin, expr(floorDiv(ptCol, binWidth)))
    // hi is exclusive: the last covered bin is floor((hi-1)/W), so an
    // interval never fans into a bin it cannot contain a point of
    val i = intervals
      // empty intervals contain nothing — and would make the bin
      // sequence run BACKWARDS (sequence auto-steps -1 when start>stop)
      .filter(col(hiCol) > col(loCol))
      .withColumn(bin, explode(sequence(
        expr(floorDiv(loCol, binWidth)),
        expr(floorDiv(s"($hiCol - 1)", binWidth)))))
    p.join(i, Seq(bin))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop(bin)
  }

  /** Reference formulation: the same join as a nested-loop predicate.
    * Correct at any scale that fits a broadcast; exists so specs can
    * assert the binned plan computes the identical result. */
  def naiveRangeJoin(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame =
    points.join(intervals,
      col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
}
