package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.sources.Tables

/** Same-session A/B probe for the tokenization stage: times the native
  * [[graft.functions.NormalizeText]] forms against the composable
  * regex folds INTERLEAVED in one JVM, so host-window drift between
  * separate probe runs (the ±30% minute-scale co-tenant noise this
  * box shows) cancels instead of masquerading as a result.
  *
  * Usage: runMain graft.TokenizeProbe
  * with SPARK_GRAFT_SF_DIR selecting the corpus (default sf0.1).
  */
object TokenizeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.builder("graft-tokenize-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.load(spark, sfDir, "documents")

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "tokens native" -> (() => d.select(Text.tokens(col("text")).as("t"))),
      "tokens fold  " -> (() => d.select(Text.tokensFold(col("text")).as("t"))),
      "hash native  " -> (() => d.select(Text.contentHash(col("text")).as("h"))),
      "hash fold    " -> (() => d.select(md5(Text.normalizeFold(col("text"))).as("h"))),
      "shingle3 nat " -> (() => d
        .select(Text.tokens(col("text")).as("t"))
        .select(explode(Text.shingles(col("t"), 3)).as("s"))),
      "shingle3 fold" -> (() => d
        .select(Text.tokensFold(col("text")).as("t"))
        .select(explode(Text.shinglesFold(col("t"), 3)).as("s"))))

    // one warmup each, then 5 interleaved timed rounds
    variants.foreach { case (_, mk) => Bench.consume(mk()) }
    val acc = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ListBuffer[Double]]()
    (1 to 5).foreach { _ =>
      variants.foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        Bench.consume(mk())
        acc.getOrElseUpdate(name,
          scala.collection.mutable.ListBuffer.empty) += (System.nanoTime() - t0) / 1e9
      }
    }
    acc.foreach { case (name, ts) =>
      println(f"[tokenize] $name median ${Bench.median(ts.toSeq)}%.3f s  " +
        ts.map(t => f"$t%.3f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
