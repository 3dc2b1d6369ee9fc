package graft

import graft.operators.Collocations

/** Phrase/collocation mining ([[operators.Collocations]]): a planted
  * phrase must outscore a frequent-but-independent pair, the discount
  * must suppress rare pairs, and the score arithmetic is checked by
  * hand on a closed-form corpus.
  */
class CollocationsSpec extends SparkSpec {

  test("planted phrase outscores independent frequent pairs; min support filters") {
    val s = spark
    import s.implicits._
    // 40 docs: every doc says "the cat", 20 of them also "new york".
    // "the" and "cat" are frequent but so are their marginals; "new"
    // and "york" occur ONLY together — the collocation signature.
    // "rare pair" appears twice, below min support.
    val docs = (0 until 40).map { i =>
      val phrase = if (i % 2 == 0) " new york" else ""
      val rare = if (i < 2) " rare pair" else ""
      s"the cat$phrase$rare"
    }.toDF("text")

    val top = Collocations.phraseScores(docs, "text",
      minCount = 5L, delta = 1.0, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

    assert(!top.exists(_._1 == "rare pair"), "below-min-support pair must drop")
    assert(top.head._1 == "new york",
      s"the always-together pair must rank first, got ${top.toSeq}")

    // Closed form: tokens per doc: the, cat (+ new, york on evens,
    // + rare, pair on i<2) → N = 80 + 40 + 4 = 124.
    // c(new york)=20, c(new)=c(york)=20 → score = 124*19/400
    val nyScore = top.find(_._1 == "new york").get._3
    assert(math.abs(nyScore - BigDecimal(124.0 * 19.0 / 400.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"hand-computed score mismatch: $nyScore")

    // "the cat" occurs 40× but both marginals are 40 → score = 124*39/1600
    val tcScore = top.find(_._1 == "the cat").get._3
    assert(tcScore < nyScore, "independent pair must score below the collocation")
  }

  test("mergePhrases is greedy left-to-right and non-cascading") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Seq("new", "york", "times", "co")).toDF("toks")
    // both ("new york") and ("york times") selected: the left merge
    // consumes "york", so "york times" cannot fire on the same tokens;
    // the merged "new_york" is not reconsidered as a LEFT either
    val got = df.select(Collocations.mergePhrases(col("toks"),
        Seq("new york", "york times")).as("m"))
      .head().getSeq[String](0)
    assert(got == Seq("new_york", "times", "co"), s"got $got")
    // empty phrase set: pass-through
    val id = df.select(Collocations.mergePhrases(col("toks"), Nil).as("m"))
      .head().getSeq[String](0)
    assert(id == Seq("new", "york", "times", "co"))
  }

  test("iterated passes find phrases of phrases (a_b + c -> a_b_c)") {
    val s = spark
    import s.implicits._
    // 10 docs "a b c" + 6 docs "x y". Pass 1 (N=42): score(a b) =
    // 42·9/100 = 3.78, score(x y) = 42·5/36 = 5.83 — both selected at
    // threshold 2; greedy rewrite gives [a_b, c] (the (b c) phrase is
    // consumed by the left merge) and [x_y]. Pass 2 (N=26): the NEW
    // bigram (a_b c) scores 26·9/100 = 2.34 ≥ 2 → merges to a_b_c.
    val docs = (Seq.fill(10)("a b c") ++ Seq.fill(6)("x y")).toDF("text")
    val pass1 = Collocations.iteratePhrases(docs, "text", rewritePasses = 1,
        minCount = 2L, delta = 1.0, threshold = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(pass1.toSeq == Seq(("a_b c", 10L, 2.34)), s"got ${pass1.toSeq}")
    // after the second rewrite no bigrams remain — everything merged
    val pass2 = Collocations.iteratePhrases(docs, "text", rewritePasses = 2,
        minCount = 2L, delta = 1.0, threshold = 2.0)
    assert(pass2.count() == 0L)
  }
}
