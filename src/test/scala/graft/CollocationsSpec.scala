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
}
