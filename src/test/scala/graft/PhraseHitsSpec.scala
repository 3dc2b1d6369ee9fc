package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumn
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{AhoCorasick, PhraseHits}

/** The eighth native expression: one-pass Aho–Corasick multi-phrase
  * counting (q146). Parity vs a brute-force sliding scan, overlap
  * semantics, UTF-8 multibyte safety, codegen + SQL paths. */
class PhraseHitsSpec extends SparkSpec {

  /** Brute reference: all (overlapping) occurrences of each pattern. */
  private def brute(text: String, pats: Seq[String]): Long =
    pats.map { p =>
      var n = 0L; var from = text.indexOf(p)
      while (from >= 0) { n += 1; from = text.indexOf(p, from + 1) }
      n
    }.sum

  test("automaton counts every overlapping occurrence of every pattern") {
    val pats = Seq("ab", "aba", "b", "xyz")
    val ac = AhoCorasick.compile(pats)
    for (t <- Seq("", "a", "ababab", "xyzxyzx", "bbbb", "abaxyzab",
        "no match here at all except b")) {
      assert(ac.countMatches(UTF8String.fromString(t)) == brute(t, pats),
        s"mismatch on '$t'")
    }
    // self-overlapping pattern: "aa" in "aaaa" = 3 (overlapping!)
    val aa = AhoCorasick.compile(Seq("aa"))
    assert(aa.countMatches(UTF8String.fromString("aaaa")) == 3L)
    // pattern that is a suffix of another still counts independently
    val suf = AhoCorasick.compile(Seq("hash batch", "batch"))
    assert(suf.countMatches(
      UTF8String.fromString("slow hash batch end")) == 2L)
  }

  test("UTF-8 multibyte patterns match at codepoint boundaries only") {
    val pats = Seq("héllo", "wörld", "日本")
    val ac = AhoCorasick.compile(pats)
    val t = "héllo wörld 日本語 héllo"
    assert(ac.countMatches(UTF8String.fromString(t)) == brute(t, pats))
  }

  test("query path (codegen) and SQL registration match the automaton") {
    val s = spark
    import s.implicits._
    val pats = Seq("quick brown", "lazy")
    val rows = Seq("the quick brown fox and the lazy dog",
      "quick brown quick brown", "nothing").toDF("t")
    val got = rows.select(GraftColumn.of(
        PhraseHits(GraftColumn.expr(col("t")), pats)).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 2L, 0L))
    val viaSql = spark.sql(
      "SELECT phrase_hits('aa lazy aa lazy', array('lazy', 'aa')) AS n")
      .head().getLong(0)
    assert(viaSql == 4L)
  }

  test("rejects empty, blank, and duplicate pattern lists") {
    intercept[IllegalArgumentException](AhoCorasickProbe(Seq.empty))
    intercept[IllegalArgumentException](AhoCorasickProbe(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasickProbe(Seq("a", "a")))
  }

  private def AhoCorasickProbe(pats: Seq[String]) =
    PhraseHits(GraftColumn.expr(org.apache.spark.sql.functions.lit("x")), pats)
}
