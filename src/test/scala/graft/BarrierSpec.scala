package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.Barrier
import graft.sources.Tables

/** The two forms of the annotate-then-gate materialization barrier —
  * localCheckpoint (local runs) and persistPath parquet round-trip
  * (the durable cluster form) — must be pure barriers: identical rows
  * out, before AND after a downstream multi-conjunct gate (the thing
  * the barrier exists to protect from predicate pushdown).
  */
class BarrierSpec extends SparkSpec {

  private def scored = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
    .select(col("doc_id"),
      Text.qualityScore(col("text"), col("toks")).as("quality"),
      Text.langId(col("text"), col("toks")).as("lang_id"),
      round(Text.stopwordFraction(col("toks")), 6).as("stop_frac"))

  test("persistPath barrier returns the same rows as localCheckpoint") {
    val dir = Files.createTempDirectory("graft_barrier").toString + "/scored"
    val local = Barrier.materialize(scored, None)
    val durable = Barrier.materialize(scored, Some(dir))
    assert(durable.schema.map(f => (f.name, f.dataType)) ==
      local.schema.map(f => (f.name, f.dataType)))
    assert(local.exceptAll(durable).isEmpty && durable.exceptAll(local).isEmpty)
    // the gate downstream of the barrier agrees too
    def gate(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("lang_id") === "en" && col("quality") >= 0.7 &&
          col("stop_frac") >= 0.05)
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("s")).head()
    assert(gate(local) == gate(durable))
  }
}
