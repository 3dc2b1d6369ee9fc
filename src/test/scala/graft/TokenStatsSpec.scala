package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Parity contract for the native `token_stats` kernel behind
  * [[Text.stopwordFraction]] / [[Text.alphaTokenFraction]] /
  * [[Text.meanWordLength]]: bit-identical doubles vs the composable
  * HOF forms on the real corpus and adversarial fixtures — null
  * arrays, null tokens (which NULL-poison the mean's numerator in the
  * fold, → 0.0), empty arrays, non-ASCII tokens, stopwords as
  * substrings (must not count). */
class TokenStatsSpec extends SparkSpec {

  test("native fractions == fold fractions on the real corpus") {
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
        "documents")
      .select(Text.tokens(col("text")).as("toks"))
    val mismatches = d.select(
        Text.stopwordFraction(col("toks")).as("sN"),
        Text.stopwordFractionFold(col("toks")).as("sF"),
        Text.alphaTokenFraction(col("toks")).as("aN"),
        Text.alphaTokenFractionFold(col("toks")).as("aF"),
        Text.meanWordLength(col("toks")).as("mN"),
        Text.meanWordLengthFold(col("toks")).as("mF"))
      .filter(col("sN") =!= col("sF") || col("aN") =!= col("aF") ||
        col("mN") =!= col("mF"))
      .count()
    assert(mismatches == 0L, s"$mismatches corpus rows disagree with the folds")
  }

  test("adversarial fixtures") {
    val s = spark
    import s.implicits._
    val cases: Seq[Seq[String]] = Seq(
      null,                                  // NULL array → all 0.0
      Seq.empty[String],                     // empty → all 0.0
      Seq("the", "THE", "thex", "a"),        // exact stopword match only
      Seq("123", "...", "Ü", "a1"),          // alpha = ASCII letters only
      Seq("x", null, "the"),                 // null token: poisons mean, not fractions
      Seq("ü", "ß"),                         // multi-byte, zero alpha
      (1 to 50).map(i => if (i % 5 == 0) "of" else s"w$i")
    )
    val rows = cases.map(Tuple1(_)).toDF("toks").select(
        Text.stopwordFraction(col("toks")).as("sN"),
        Text.stopwordFractionFold(col("toks")).as("sF"),
        Text.alphaTokenFraction(col("toks")).as("aN"),
        Text.alphaTokenFractionFold(col("toks")).as("aF"),
        Text.meanWordLength(col("toks")).as("mN"),
        Text.meanWordLengthFold(col("toks")).as("mF"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getDouble(0) == r.getDouble(1), s"stopword on $c")
      assert(r.getDouble(2) == r.getDouble(3), s"alpha on $c")
      assert(r.getDouble(4) == r.getDouble(5), s"meanlen on $c")
    }
    // the null-token row: mean collapses to 0.0 (fold's poisoned sum)
    val nullRow = rows(4)
    assert(nullRow.getDouble(4) == 0.0)
  }
}
