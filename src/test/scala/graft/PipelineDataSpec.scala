package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.CorpusPrep
import graft.pipeline.Pipeline
import graft.pipeline.Pipeline.{Context, ShortCircuit, Task, Value}
import graft.sources.Tables

/** The pipeline DSL driving REAL Spark dataflow: the q57 curation
  * stages as tasks passing DataFrames through xcom, with a
  * short-circuit guard — proves the orchestration layer composes with
  * the engine rather than existing beside it. DataFrames are lazy
  * plans, so xcom hands stages a growing plan, not materialized data:
  * Catalyst optimizes the WHOLE composed pipeline at the sink, exactly
  * as if it were written as one query. */
class PipelineDataSpec extends SparkSpec {

  test("curation pipeline via DSL tasks equals the direct composition") {
    val docs = Tables.load(spark, sfDir, "documents")

    val score = Task("score", _ => Value(
      docs.select(col("doc_id"), col("text"),
        Text.langId(col("text")).as("lang_id"),
        Text.qualityScore(col("text")).as("quality"),
        Text.contentHash(col("text")).as("content_hash"))))

    val guard = Task("guard", (c: Context) => {
      // short-circuit the whole run if nothing passes the filter —
      // the reference's "skip downstream when no data" pattern
      val kept = c.xcom[DataFrame]("score")
        .filter(col("lang_id") === "en" && col("quality") >= 0.6)
      if (kept.isEmpty) ShortCircuit(proceed = false) else Value(kept)
    }, upstream = Seq("score"))

    val dedup = Task("dedup", (c: Context) => {
      val kept = c.xcom[DataFrame]("guard")
      val survivors = kept.groupBy(col("content_hash"))
        .agg(min(col("doc_id")).as("doc_id"))
      Value(kept.join(survivors, Seq("content_hash", "doc_id"), "left_semi"))
    }, upstream = Seq("guard"))

    val chunk = Task("chunk", (c: Context) => Value(
      CorpusPrep.chunkSliding(c.xcom[DataFrame]("dedup"), "doc_id", "text",
        size = 32, stride = 24)),
      upstream = Seq("dedup"))

    val run = Pipeline.run(Seq(score, guard, dedup, chunk))
    assert(run.status("chunk") == Pipeline.Success)

    val got = run.value[DataFrame]("chunk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

    // direct composition, no DSL
    val scored = docs.select(col("doc_id"), col("text"),
      Text.langId(col("text")).as("lang_id"),
      Text.qualityScore(col("text")).as("quality"),
      Text.contentHash(col("text")).as("content_hash"))
      .filter(col("lang_id") === "en" && col("quality") >= 0.6)
    val survivors = scored.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    val want = CorpusPrep.chunkSliding(
      scored.join(survivors, Seq("content_hash", "doc_id"), "left_semi"),
      "doc_id", "text", size = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

    assert(got.nonEmpty && got == want)
  }

  test("empty input short-circuits: downstream stages skip, none fail") {
    val docs = Tables.load(spark, sfDir, "documents")
    val score = Task("score", _ => Value(docs.filter(lit(false))))
    val guard = Task("guard", (c: Context) => {
      val kept = c.xcom[DataFrame]("score")
      if (kept.isEmpty) ShortCircuit(proceed = false) else Value(kept)
    }, upstream = Seq("score"))
    val chunk = Task("chunk", (c: Context) => Value(
      CorpusPrep.chunkSliding(c.xcom[DataFrame]("guard"), "doc_id", "text", 32, 24)),
      upstream = Seq("guard"))

    val run = Pipeline.run(Seq(score, guard, chunk))
    assert(run.status("guard") == Pipeline.Success)
    assert(run.status("chunk") == Pipeline.Skipped)
  }
}
