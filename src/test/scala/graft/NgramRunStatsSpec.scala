package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Parity contract for the native `ngram_run_stats` expression: its
  * (top_count, top_chars) must equal the composable sorted-run folds
  * it replaced, value-for-value, on adversarial shapes — and its
  * codegen and interpreted paths must agree (both exercised: the
  * projection runs codegen'd; the fold forces interpreted HOF eval).
  */
class NgramRunStatsSpec extends SparkSpec {

  test("native run stats == composable folds on adversarial arrays") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      Seq("a"),                                       // singleton
      Seq("a", "a", "a"),                             // one total run
      Seq("a", "b", "a", "b", "a"),                   // interleaved
      Seq("", "", "x"),                               // empty-string grams
      Seq("aa", "b", "b", "b"),                       // long-run short gram
      Seq("a fairly long ngram value", "b", "a fairly long ngram value"), // cover beats count
      Seq("ü", "ü", "u"),                             // non-ASCII numChars
      (1 to 200).map(i => s"g${i % 7}"),              // many runs
      Seq("a", null, "a"),                            // null splits no run
      Seq(null.asInstanceOf[String]),                 // lone null → (0, 0)
      Seq(null, null, "b", "b"),                      // null run never wins
      Seq(null, "", "x")                              // null next to empty gram
    )
    val df = cases.map(Tuple1(_)).toDF("ng")
    val got = df.select(
        call_function("ngram_run_stats", col("ng")).getField("top_count").as("nc"),
        call_function("ngram_run_stats", col("ng")).getField("top_chars").as("nch"),
        Text.topRunFold(col("ng")).as("fc"),
        Text.topCoverFold(col("ng")).as("fch"))
      .collect()
    got.zip(cases).foreach { case (r, c) =>
      assert(r.getLong(0) == r.getLong(2),
        s"top_count ${r.getLong(0)} != fold ${r.getLong(2)} on $c")
      assert(r.getLong(1) == r.getLong(3),
        s"top_chars ${r.getLong(1)} != fold ${r.getLong(3)} on $c")
    }
  }

  test("empty array yields (0, 0) and the Text wrappers yield 0.0") {
    val s = spark
    import s.implicits._
    val r = Seq(Tuple1(Seq.empty[String])).toDF("ng")
      .select(
        call_function("ngram_run_stats", col("ng")).getField("top_count").as("c"),
        Text.topNgramShare(col("ng")).as("share"),
        Text.topNgramCharFraction(col("ng"), lit(100)).as("cover"))
      .head()
    assert(r.getLong(0) == 0L && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
  }
}
