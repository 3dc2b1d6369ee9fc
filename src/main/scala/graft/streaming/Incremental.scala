package graft.streaming

import java.time.Instant
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-scoped incremental processing (SURVEY.md §2.9 T1/T13).
  *
  * The reference's core incremental pattern: every pipeline run processes
  * a half-open time slice `[data_interval_start, logical_date)`
  * (`dags/tutorial_objectstorage.py:75-88`), with `catchup=False` /
  * `LatestOnlyOperator` (`dags/tutorial_dag.py:51`,
  * `dags/example_latest_only.py:35-38`) restricting to the newest slice.
  *
  * Expressed as a plain predicate on the event-time column so Catalyst
  * pushes it into the parquet scan (`PushedFilters: [GreaterThanOrEqual,
  * LessThan]`) — at 100 TB only the slice's row groups / partitions are
  * read, which is the whole point of interval-scoped extraction.
  */
object Incremental {

  /** Restrict `df` to `tsCol ∈ [start, end)` — the reference's per-run
    * data interval. Timestamps are compared in UTC (session-pinned). */
  def intervalScoped(df: DataFrame, tsCol: String, start: Instant, end: Instant): DataFrame = {
    require(!end.isBefore(start), s"empty/negative interval: [$start, $end)")
    df.filter(
      col(tsCol) >= lit(java.sql.Timestamp.from(start)) &&
      col(tsCol) <  lit(java.sql.Timestamp.from(end)))
  }

  /** Catch-up planning: split `[start, end)` into consecutive slices of
    * `step` — the backfill run list the reference's scheduler derives
    * when `catchup=True`. Driver-side metadata only (no data touched). */
  def slices(start: Instant, end: Instant, step: java.time.Duration): Seq[(Instant, Instant)] = {
    require(!step.isNegative && !step.isZero, s"bad step: $step")
    Iterator.iterate(start)(_.plus(step)).takeWhile(_.isBefore(end))
      .map(s => (s, Seq(s.plus(step), end).min)).toSeq
  }

  /** Latest-only: of the computed slices, keep just the newest —
    * `LatestOnlyOperator` semantics (`dags/example_latest_only.py:35-38`). */
  def latestOnly(slcs: Seq[(Instant, Instant)]): Seq[(Instant, Instant)] =
    slcs.lastOption.toSeq
}
