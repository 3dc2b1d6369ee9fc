package graft

import graft.operators.{Bpe, NgramLm, WordPiece}
import graft.sources.Tables

/** Grades WordPiece vocabulary induction ([[graft.operators.WordPiece]],
  * Schuster & Nakajima 2012): the likelihood-scored argmax on a
  * hand-computable corpus, the divergence from BPE's frequency argmax,
  * the hybrid driver-side/distributed loop equality, the incremental
  * (mergeable word-count) contract, and application through the shared
  * `(w, f, syms)` vocab convention. The 5-merge training loop is also
  * oracle-checked end-to-end in DuckDB (q116). */
class WordPieceSpec extends SparkSpec {

  private def toyDocs = {
    val s = spark
    import s.implicits._
    // corpus frequencies: low 5, lower 2, newest 6, widest 3 — the
    // BpeSpec corpus, so the two families' choices are comparable
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("first merge maximizes cnt/(c(l)*c(r)), not raw pair count") {
    // symbol counts: l 7, o 7, w 16, e 17, r 2, n 6, s 9, t 9, i 3,
    // d 3, </w> 16. BPE's first pick is (e,s) at cnt 9; WordPiece must
    // instead pick the rare-symbol pair (i,d): 3/(3*3) = 1/3, beating
    // (d,e) 3/(3*17), (e,s) 9/(17*9) ≈ 0.0588, and every other pair —
    // the defining behavioral difference of the likelihood objective
    val (merges, _) = WordPiece.train(toyDocs, "text", k = 1)
    val (l, r, cnt, score) = merges.head
    assert((l, r, cnt) == (("i", "d", 3L)), s"got $merges")
    assert(score == 3.0d / (3.0d * 3.0d), s"got $score")
    // and BPE on the same corpus picks differently — the families are
    // genuinely distinct objectives over identical mechanics
    assert(Bpe.learnMerges(toyDocs, "text", k = 1).head._1 != "i")
  }

  test("hybrid driver-side loop matches the distributed loop at k=8 on the real corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val (driverMerges, driverSeg) = WordPiece.train(docs, "text", k = 8)
    val (distMerges, distSeg) =
      WordPiece.train(docs, "text", k = 8, driverMaxWords = 0L)
    assert(driverMerges == distMerges,
      s"driver $driverMerges vs distributed $distMerges")
    def segMap(df: org.apache.spark.sql.DataFrame) =
      df.select("w", "f", "syms").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    assert(segMap(driverSeg) == segMap(distSeg))
  }

  test("two-batch merged word counts retrain the whole-corpus vocabulary exactly") {
    // the incremental contract shared with Bpe/Dsir/NgramLm: word
    // counts are the only corpus-derived state and merge associatively
    val docs = Tables.load(spark, sfDir, "documents")
    val c = org.apache.spark.sql.functions.col("doc_id")
    val mergedWf = NgramLm.mergeCounts(
      Bpe.wordFreq(docs.where(c % 2 === 0), "text"),
      Bpe.wordFreq(docs.where(c % 2 === 1), "text"))
    val (mMerges, _) = WordPiece.trainFromWordFreq(mergedWf, k = 5)
    val (wMerges, _) = WordPiece.train(docs, "text", k = 5)
    assert(mMerges == wMerges)
  }

  test("segmentation always reconstructs word+</w> on the real corpus") {
    // the conservation law is objective-independent: WordPiece merges
    // only ever concatenate adjacent symbols
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val (_, seg) = WordPiece.train(docs, "text", k = 5)
    val bad = seg.filter(
      concat_ws("", col("syms")) =!= concat(col("w"), lit(Bpe.EndOfWord)))
      .take(3)
    assert(bad.isEmpty, s"non-reconstructing rows: ${bad.mkString("; ")}")
  }

  test("a trained WordPiece vocab prices documents through Bpe.tokenCounts") {
    val s = spark
    import s.implicits._
    val (_, vocabSeg) = WordPiece.train(toyDocs, "text", k = 3)
    val doc = Seq((42L, "low lower newest widest")).toDF("doc_id", "text")
    val row = Bpe.tokenCounts(doc, "doc_id", "text", vocabSeg).head()
    assert(row.getLong(0) == 42L)
    assert(row.getLong(1) == 4L)
    // 3 merges removed exactly 3 symbol boundaries from the 4 words'
    // 21 initial symbols wherever they apply; count must be positive
    // and at most 21
    assert(row.getLong(2) > 0L && row.getLong(2) <= 21L, s"got $row")
  }

  test("greedy max-match is longest-first, handles OOV, and can diverge from training") {
    val s = spark
    import s.implicits._
    // inventory {a, b, ab, abc, </w>}: "abab" matches ab|ab|</w>
    // (longest-first), "abc..." shows greedy divergence potential,
    // "axb" has no 'x' piece → [UNK]
    val inv = Set("a", "b", "ab", "abc", "</w>")
    assert(WordPiece.maxMatchPath("abab" + Bpe.EndOfWord, inv, 4) == "ab ab </w>")
    // greedy takes abc first, leaving a|b, NOT the ab|ab split a
    // training history might have produced
    assert(WordPiece.maxMatchPath("abcab" + Bpe.EndOfWord, inv, 4) == "abc ab </w>")
    assert(WordPiece.maxMatchPath("axb" + Bpe.EndOfWord, inv, 4) == WordPiece.Unk)
    // and through the DataFrame path with the (w, f, syms) convention
    val words = Seq(("abab", 3L), ("axb", 1L)).toDF("w", "f")
    val pieces = inv.toSeq.toDF("piece")
    val got = WordPiece.maxMatchSegments(words, pieces)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(got("abab") == Seq("ab", "ab", "</w>"), s"got $got")
    assert(got("axb") == Seq(WordPiece.Unk), s"got $got")
  }

  test("max-match covers every training word of its own corpus without UNK") {
    // the coverage sanity a shipped tokenizer is asserted with: the
    // inventory was induced FROM these words, and single characters
    // only leave the inventory if every occurrence merged — so the
    // training corpus itself must segment UNK-free
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val (_, seg) = WordPiece.train(docs, "text", k = 5)
    val mm = WordPiece.maxMatchSegments(
      graft.operators.Bpe.wordFreq(docs, "text"), WordPiece.inventory(seg))
    val unk = mm.filter(col("syms") === array(lit(WordPiece.Unk))).take(3)
    assert(unk.isEmpty, s"UNK on training words: ${unk.mkString("; ")}")
    // conservation: max-match pieces reconstruct word+</w> (non-UNK)
    val bad = mm.filter(
      concat_ws("", col("syms")) =!= concat(col("w"), lit(Bpe.EndOfWord)))
      .take(3)
    assert(bad.isEmpty, s"non-reconstructing: ${bad.mkString("; ")}")
  }

  test("stale heap entries cannot resurrect a merged-away pair") {
    val s = spark
    import s.implicits._
    // after merging (a,b) everywhere, the pair is dead: training must
    // move on (or exhaust), never emit (a,b) twice — exercises the
    // lazy-revalidation path where old (score, a, b) entries remain in
    // the heap after their counts changed
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val (merges, seg) = WordPiece.train(docs, "text", k = 5)
    assert(merges.map(m => (m._1, m._2)).distinct == merges.map(m => (m._1, m._2)),
      s"duplicate merge in $merges")
    // "ab" fully merges to a single symbol in two steps
    assert(seg.select("syms").head().getSeq[String](0) == Seq("ab" + Bpe.EndOfWord),
      s"got $merges / ${seg.collect().toSeq}")
    assert(merges.length == 2, s"got $merges")
  }
}
