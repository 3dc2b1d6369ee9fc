package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface (SURVEY.md §2.9 T2, T15; §1 Dataset
  * events → file-arrival sources).
  *
  * The reference's event-driven runs ("dataset updated → consumer DAG
  * runs", `dags/example_datasets.py:89-102`) map to a file-arrival
  * streaming source + `Trigger.AvailableNow`: each invocation processes
  * exactly the files that arrived since the checkpoint, then stops —
  * incremental batch, the catchup=False semantics. Watermarked windowed
  * aggregation covers the hourly re-aggregation pattern (A4) under
  * late data; `flatMapGroupsWithState` covers custom state (session
  * windows over the events stream).
  */
object Streams {

  /** T2: file-arrival source over a directory of parquet files. The
    * schema must be declared (streaming sources don't infer). */
  def fileArrival(spark: SparkSession, path: String, schemaDdl: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schemaDdl)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(path)
  }

  /** T15/A4: event-time windowed aggregation with a watermark. Late
    * rows beyond `watermark` are dropped and their windows finalized —
    * bounded state at 100 TB/day stream rates. `valueCol` names the
    * summed column (previously hardcoded to "value", which failed
    * analysis on any stream without that exact name). */
  def windowedCounts(stream: DataFrame, tsCol: String, window_ : String,
      watermark: String, keyCols: String*): DataFrame =
    windowedCountsOf(stream, tsCol, window_, watermark, "value", keyCols: _*)

  /** [[windowedCounts]] with an explicit value column. */
  def windowedCountsOf(stream: DataFrame, tsCol: String, window_ : String,
      watermark: String, valueCol: String, keyCols: String*): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))

  /** Run an incremental pass: process everything new since the
    * checkpoint, write parquet, stop. Repeated calls = the reference's
    * per-interval scheduled runs. */
  def runAvailableNow(stream: DataFrame, outPath: String, checkpoint: String,
      outputMode: OutputMode = OutputMode.Append): Unit = {
    val q = stream.writeStream
      .outputMode(outputMode)
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Incremental pass with arbitrary per-micro-batch merge logic:
    * `Trigger.AvailableNow` + `foreachBatch` — the hook for sink-side
    * maintenance Structured Streaming cannot express declaratively
    * (index upsert, dedup-against-store, MERGE-shaped writes). The
    * checkpoint still guarantees each file is processed exactly once
    * across invocations; `fn` receives the micro-batch DataFrame and
    * the batch id (StreamsSpec drives the incremental exact-dedup
    * index through this). */
  def runForeachBatch(stream: DataFrame, checkpoint: String)(
      fn: (DataFrame, Long) => Unit): Unit = {
    val q = stream.writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** T15: stream-stream inner join bounded by a time range — the
    * impression↔click attribution shape. Both sides carry watermarks
    * and the join condition bounds `rightTs` to
    * [leftTs, leftTs + within], so state on each side is evictable
    * once the other side's watermark passes the bound — bounded state
    * regardless of stream volume. Column names must be disjoint; the
    * join key columns are `leftKey`/`rightKey`.
    */
  def timeBoundJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      watermark: String, within: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))

  /** Streaming exact dedup with bounded state: duplicates of a key are
    * suppressed while the key is younger than the watermark delay, then
    * the key's state is evicted — the streaming counterpart of
    * [[graft.operators.Dedup.exact]] for at-least-once sources. Unlike
    * plain `dropDuplicates`, state does NOT grow with the key universe.
    */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String,
      watermark: String, keyCols: String*): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.toSeq)

  // ----- custom state: sessionization via flatMapGroupsWithState -----

  final case class Event(userId: Long, tsMs: Long)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(userId: Long, startMs: Long, endMs: Long, nEvents: Int)

  /** Per-user sessionization with a gap timeout: events closer than
    * `gapMs` merge into one session. In STREAMING, a processing-time
    * timeout of `gapMs` flushes the idle open session and EVICTS its
    * state entry — without it, every user's final session would never
    * emit and state would grow with the key universe forever
    * (processing-time is an approximation of the event-time gap; the
    * standard flatMapGroupsWithState tradeoff). In BATCH, timeouts
    * never fire by definition, so open sessions stay in state and only
    * closed sessions return — StreamsSpec pins that contract. State is
    * one small record per active user. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start, s.last, s.n))
          } else {
            val sorted = it.toSeq.sortBy(_.tsMs)
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMs - s.last <= gapMs =>
                  cur = Some(s.copy(last = e.tsMs, n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.start, s.last, s.n)
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1))
                case None =>
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapMs)
            }
            closed.iterator
          }
      }
  }
}
