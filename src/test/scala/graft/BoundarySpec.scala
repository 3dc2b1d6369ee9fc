package graft

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Boundary semantics the oracle data never happens to exercise:
  * the exact-gap session edge and width_bucket's range edges. These
  * pin the semantics so a refactor that flips an inequality fails a
  * unit test even when the synthetic corpus wouldn't notice.
  */
class BoundarySpec extends SparkSpec {

  test("session gap of exactly 30 minutes does NOT start a new session") {
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(mins: Long) = new Timestamp(t0.getTime + mins * 60000L)
    val events = Seq(
      (1L, 1L, t0),
      (1L, 2L, plus(30)),      // gap == 30min → SAME session (strict >)
      (1L, 3L, plus(61)),      // gap 31min   → new session
      (1L, 4L, plus(121)))     // gap 60min   → new session
      .toDF("user_id", "event_id", "ts")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(w)
    val sess = events.withColumn("new_sess",
        when(prev.isNull || col("ts") > prev + expr("interval 30 minutes"), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("session_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("gopher signals flag planted defects the clean corpus never shows") {
    val s = spark
    import s.implicits._
    import graft.functions.Text
    // q77's corpus passes every gate (clean synthetic text), so pin the
    // DISCRIMINATION here: each planted defect trips exactly its signal.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near a river bank today"),
      (2L, "buy now buy now buy now buy now buy now buy now"),      // repeated phrase
      (3L, "$$$ ### !!! %%% @@@ ^^^ &&& *** ((( )))"),              // symbol soup
      (4L, "a\nb\nc\na\nb\nc\na\nb"),                               // repeated lines
      (5L, "supercalifragilisticexpialidocious pneumonoultramicroscopicsilicovolcanoconiosis"))
      .toDF("doc_id", "text")
    val sig = docs
      .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("text"), col("toks"),
        Text.wordNgrams(col("toks"), 2).as("ng"),
        split(col("text"), "\n").as("ls"))
      .select(col("doc_id"),
        Text.duplicateLineFraction(col("ls")).as("dup"),
        Text.topNgramShare(col("ng")).as("top2"),
        Text.symbolToWordRatio(col("text"), col("toks")).as("sym"),
        Text.stopwordFraction(col("toks")).as("stop"),
        Text.meanWordLength(col("toks")).as("mwl"),
        Text.alphaTokenFraction(col("toks")).as("alpha"))
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(sig(1L).getAs[Double]("top2") < 0.2 && sig(1L).getAs[Double]("sym") == 0.0)
    assert(sig(1L).getAs[Double]("stop") > 0.2, "clean English has stopwords")
    // "buy now" = 6 of 11 bigrams
    assert(sig(2L).getAs[Double]("top2") > 0.5, "repeated phrase must dominate")
    assert(sig(3L).getAs[Double]("sym") > 1.0 && sig(3L).getAs[Double]("alpha") == 0.0)
    assert(sig(4L).getAs[Double]("dup") == 5.0 / 8.0, "5 of 8 lines are repeats")
    assert(sig(5L).getAs[Double]("mwl") > 10.0, "gibberish-length words")
  }

  test("char-weighted repetition signals see what count-weighted ones miss") {
    val s = spark
    import s.implicits._
    import graft.functions.Text
    // One LONG boilerplate line repeated once among short unique lines:
    // count-weighted dup fraction says 1/4, char-weighted says ~half the
    // document — the case Gopher gates on both for.
    val long = "x" * 16
    val one = Seq(Tuple1(s"$long\na\nb\n$long")).toDF("text")
      .select(split(col("text"), "\n").as("ls"))
      .select(
        Text.duplicateLineFraction(col("ls")).as("cnt"),
        Text.duplicateCharFraction(col("ls")).as("chr"))
      .head()
    assert(one.getAs[Double]("cnt") == 0.25)
    assert(one.getAs[Double]("chr") == 16.0 / 34.0)

    // top-3-gram char coverage: "buy now buy now buy now" — best 3-gram
    // covers 2 × 11 chars of the 23-char normalized text
    val cov = Seq(Tuple1("buy now buy now buy now")).toDF("text")
      .select(Text.tokens(col("text")).as("toks"))
      .select(
        Text.topNgramCharFraction(Text.wordNgrams(col("toks"), 3),
          length(array_join(col("toks"), " "))).as("c3"),
        Text.duplicateLineFraction(Text.wordNgrams(col("toks"), 5)).as("d5"))
      .head()
    assert(cov.getAs[Double]("c3") == 22.0 / 23.0)
    // 5-grams: [b n b n b, n b n b n] → no repeats in 2 grams
    assert(cov.getAs[Double]("d5") == 0.0)

    // empty / degenerate inputs stay 0.0, never NaN
    val z = Seq(Tuple1("")).toDF("text")
      .select(split(col("text"), "\n").as("ls"))
      .select(
        Text.duplicateCharFraction(col("ls")).as("chr"),
        Text.topNgramCharFraction(array().cast("array<string>"), lit(0)).as("c3"))
      .head()
    assert(z.getAs[Double]("chr") == 0.0 && z.getAs[Double]("c3") == 0.0)
  }

  test("normalize strips non-space edge whitespace (trailing-newline dedup)") {
    val s = spark
    import s.implicits._
    import graft.functions.Text
    // trim() strips only ASCII spaces: the old trim-then-collapse order
    // left "hello\n" normalizing to "hello " — a missed exact duplicate
    // of "hello". Collapse-then-trim removes any edge whitespace run.
    val r = Seq("hello world", "hello world\n", "\thello  world", "hello world \r\n")
      .toDF("text").select(Text.contentHash(col("text")).as("h"))
      .distinct().count()
    assert(r == 1L, "whitespace-edge variants must share one content hash")
  }

  test("every quality signal is 0.0 (never NULL or negative) on NULL text") {
    val s = spark
    import s.implicits._
    import graft.functions.Text
    // the synthetic corpus has no NULL text, so pin the degenerate row
    // here: size(NULL array) is -1 in Spark and un-guarded signals leak
    // -1.0 ratios (which silently PASS <=-threshold gates) or NULLs
    // (which make the combined gate three-valued)
    val row = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(col("text"), Text.tokens(col("text")).as("toks"))
      .select(col("text"), col("toks"),
        Text.wordNgrams(col("toks"), 2).as("ng"),
        Text.tokenChunks(col("toks")).as("ls"))
      .select(
        Text.duplicateLineFraction(col("ls")).as("dup"),
        Text.duplicateCharFraction(col("ls")).as("dupc"),
        Text.topNgramShare(col("ng")).as("top2"),
        Text.topNgramCharFraction(col("ng"), length(col("text"))).as("top2c"),
        Text.symbolToWordRatio(col("text"), col("toks")).as("sym"),
        Text.stopwordFraction(col("toks")).as("stop"),
        Text.meanWordLength(col("toks")).as("mwl"),
        Text.alphaTokenFraction(col("toks")).as("alpha"))
      .head()
    (0 until row.size).foreach { i =>
      assert(!row.isNullAt(i), s"signal ${row.schema(i).name} is NULL on NULL text")
      assert(row.getDouble(i) == 0.0,
        s"signal ${row.schema(i).name} = ${row.getDouble(i)} on NULL text")
    }
    // the classifier-shaped signals have their own degenerate values:
    // qualityScore 0.0 (a NULL would make >= gates three-valued) and
    // langId "und" (undetermined, never NULL)
    val cls = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(col("text"), Text.tokens(col("text")).as("toks"))
      .select(
        Text.qualityScore(col("text"), col("toks")).as("qs"),
        Text.langId(col("text"), col("toks")).as("lid"))
      .head()
    assert(!cls.isNullAt(0) && cls.getDouble(0) == 0.0,
      s"qualityScore = ${cls.get(0)} on NULL text")
    assert(cls.getString(1) == "und", s"langId = ${cls.get(1)} on NULL text")
  }

  test("width_bucket matches its SQL-standard definition on every edge") {
    val s = spark
    import s.implicits._
    // q71's oracle spells the definition out manually (DuckDB lacks the
    // builtin); this pins Spark's builtin to that spelled-out form on
    // underflow, every internal edge, and overflow.
    val xs = (-60L to 660L by 30L) :+ 599L :+ 1L :+ -1L
    val got = xs.toDF("x").select(col("x"),
        width_bucket(col("x").cast("double"), lit(0.0), lit(600.0), lit(12L)).as("wb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val manual = if (x < 0) 0L else if (x >= 600) 13L else 1L + x / 50
      assert(got(x) == manual, s"x=$x got=${got(x)} manual=$manual")
    }
  }
}
