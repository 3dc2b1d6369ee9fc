package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Parity contract for the native `TokenWindows` kernel behind
  * [[Text.wordNgrams]] / [[Text.shingles]] / [[Text.tokenChunks]]: each
  * native form must return BIT-IDENTICAL arrays (same strings, same
  * order) to the composable lambda-HOF form it replaced, on the real
  * corpus and on adversarial fixtures — null arrays, null tokens,
  * empty arrays, shorter-than-width docs, exact-width docs, repeated
  * shingles (first-occurrence dedup order), truncated final chunks.
  * Both execution paths are exercised: the projection runs codegen'd,
  * the fold forces interpreted HOF eval in the same projection.
  */
class TokenWindowsSpec extends SparkSpec {

  private val cases: Seq[Seq[String]] = Seq(
    null,                                            // NULL array → empty, not NULL
    Seq.empty[String],                               // empty array
    Seq("a"),                                        // shorter than n
    Seq("a", "b"),                                   // exactly n (n = 2)
    Seq("a", "b", "c", "d", "e"),                    // plain run
    Seq("a", "b", "a", "b", "a", "b"),               // repeated shingles
    Seq("x", null, "y", "z"),                        // null token skipped, no doubled space
    Seq(null, null),                                 // all-null window → "" gram
    Seq("", "a", ""),                                // empty-string tokens are real values
    Seq("ü", "ß", "é", "ü", "ß"),                    // multi-byte tokens
    (1 to 97).map(i => s"t${i % 13}")                // long doc, non-multiple of widths
  )

  private def df = {
    val s = spark
    import s.implicits._
    cases.map(Tuple1(_)).toDF("toks")
  }

  private def assertSame(name: String, native: org.apache.spark.sql.Column,
      fold: org.apache.spark.sql.Column): Unit = {
    val got = df.select(native.as("n"), fold.as("f")).collect()
    got.zip(cases).foreach { case (r, c) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"$name native ${r.getSeq[String](0)} != fold ${r.getSeq[String](1)} on $c")
    }
  }

  test("wordNgrams native == fold (n = 1, 2, 3, 8)") {
    Seq(1, 2, 3, 8).foreach { n =>
      assertSame(s"wordNgrams(n=$n)",
        Text.wordNgrams(col("toks"), n), Text.wordNgramsFold(col("toks"), n))
    }
  }

  test("shingles native == fold (n = 2, 3, 5)") {
    Seq(2, 3, 5).foreach { n =>
      assertSame(s"shingles(n=$n)",
        Text.shingles(col("toks"), n), Text.shinglesFold(col("toks"), n))
    }
  }

  test("tokenChunks native == fold (width = 1, 3, 8)") {
    Seq(1, 3, 8).foreach { w =>
      assertSame(s"tokenChunks(w=$w)",
        Text.tokenChunks(col("toks"), w), Text.tokenChunksFold(col("toks"), w))
    }
  }

  test("parity on the real corpus (documents, n-gram + shingle + chunk)") {
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(Text.tokens(col("text")).as("toks"))
    val mismatches = d.select(
        Text.wordNgrams(col("toks"), 3).as("ngN"),
        Text.wordNgramsFold(col("toks"), 3).as("ngF"),
        Text.shingles(col("toks"), 3).as("shN"),
        Text.shinglesFold(col("toks"), 3).as("shF"),
        Text.tokenChunks(col("toks"), 8).as("chN"),
        Text.tokenChunksFold(col("toks"), 8).as("chF"))
      .filter(col("ngN") =!= col("ngF") || col("shN") =!= col("shF") ||
        col("chN") =!= col("chF"))
      .count()
    assert(mismatches == 0L, s"$mismatches corpus rows disagree with the fold forms")
  }

  test("SQL registration resolves and matches the Column API") {
    val s = spark
    import s.implicits._
    val r = Seq(Tuple1(Seq("a", "b", "c", "a", "b", "c"))).toDF("toks")
      .select(
        expr("word_ngrams(toks, 2)").as("ng"),
        Text.wordNgrams(col("toks"), 2).as("ng2"),
        expr("word_shingles(toks, 2)").as("sh"),
        Text.shingles(col("toks"), 2).as("sh2"),
        expr("token_chunks(toks, 4)").as("ch"),
        Text.tokenChunks(col("toks"), 4).as("ch2"))
      .head()
    assert(r.getSeq[String](0) == r.getSeq[String](1))
    assert(r.getSeq[String](2) == r.getSeq[String](3))
    assert(r.getSeq[String](4) == r.getSeq[String](5))
    assert(r.getSeq[String](2) == Seq("a b", "b c", "c a")) // first-occurrence order
    assert(r.getSeq[String](4) == Seq("a b c a", "b c"))    // truncated tail chunk
  }
}
