package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Token-entropy micro-nat fold ([[functions.Text.tokenEntropyFp]]):
  * exact hand-computed values, the uniform-maximum and
  * single-token-zero limits, order independence (the fold sorts), and
  * the repetitive-vs-diverse ordering the quality gate relies on.
  */
class EntropySpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  private def accOf(tokens: Seq[String]): Long =
    Seq(Tuple1(tokens)).toDF("toks")
      .select(Text.tokenEntropyFp(col("toks")).as("acc"))
      .collect()(0).getLong(0)

  /** Reference arithmetic: Σ round(−c·ln(c/n)·1e6) with Spark's
    * HALF_UP rounding. */
  private def expected(tokens: Seq[String]): Long =
    tokens.groupBy(identity).values.map { g =>
      val c = g.size.toDouble; val n = tokens.size.toDouble
      BigDecimal.valueOf(-(c * math.log(c / n)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum

  test("exact micro-nat accumulator on hand inputs") {
    for (toks <- Seq(
        Seq("a", "b", "a", "c", "a", "b"),
        Seq("x"),
        Seq("x", "x", "x", "x"),
        Seq("a", "b", "c", "d")))
      assert(accOf(toks) === expected(toks), s"tokens = $toks")
  }

  test("limits: all-same tokens score zero; uniform scores n·ln(n)") {
    assert(accOf(Seq("w", "w", "w")) === 0L)
    // 4 distinct of 1 each: acc = 4·round(ln(4)·1e6) = 4·1386294
    assert(accOf(Seq("a", "b", "c", "d")) === 4L * 1386294L)
    assert(accOf(Seq.empty[String]) === 0L)
  }

  test("input order cannot matter (the fold sorts first)") {
    val toks = Seq("m", "z", "a", "z", "m", "z")
    assert(accOf(toks) === accOf(toks.reverse))
    assert(accOf(toks) === accOf(toks.sorted))
  }

  test("repetitive text scores below diverse text at equal length") {
    val spam = accOf(Seq.fill(12)("buy"))
    val prose = accOf(Seq("the", "quick", "brown", "fox", "jumps", "over",
      "a", "lazy", "dog", "near", "still", "water"))
    assert(spam < prose)
  }
}
