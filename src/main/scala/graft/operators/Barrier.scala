package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization barrier for annotate-then-gate pipelines.
  *
  * The curation flagships score the corpus once (regex/HOF-heavy
  * signal columns) and then filter on many signal conjuncts. Without a
  * barrier between the two, Catalyst's predicate pushdown substitutes
  * each conjunct's alias definition below the projection — n gate
  * conjuncts × the full tokenize/ngram/chunk tree per row, with no
  * codegen CSE because lambda-HOF signals evaluate interpreted
  * (measured 23 s vs ~5 s at sf0.1 on q80). Materializing the scored
  * table keeps the corpus pass at exactly one; it is also the real
  * pipeline shape — signal tables are persisted for threshold tuning.
  *
  * Two forms, same values:
  *
  *  - `persistPath = None` → `localCheckpoint(eager = true)`: blocks
  *    live on executors WITHOUT lineage. Right for single-JVM/local
  *    runs (no FS round-trip), but on a real cluster an executor loss
  *    mid-query loses blocks that cannot be recomputed — the job dies.
  *  - `persistPath = Some(dir)` → write parquet, read it back: the
  *    durable form for 1000-executor/100 TB runs. Executor loss only
  *    re-reads files; the scored table also outlives the job for
  *    threshold tuning and audits. Costs one FS round-trip, which at
  *    scale is the cheap insurance.
  *
  * BarrierSpec pins that both forms return identical rows.
  */
object Barrier {

  def materialize(df: DataFrame, persistPath: Option[String] = None): DataFrame =
    persistPath match {
      case Some(dir) =>
        df.write.mode("overwrite").parquet(dir)
        df.sparkSession.read.parquet(dir)
      case None =>
        df.localCheckpoint(true)
    }
}
