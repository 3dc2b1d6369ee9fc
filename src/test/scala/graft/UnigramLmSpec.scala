package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramLm
import graft.sources.Tables

/** Contracts for unigram-LM (SentencePiece-style) tokenizer training
  * ([[graft.operators.UnigramLm]]):
  *   - seeding, quantization, and Viterbi selection match hand-computed
  *     micro-nat arithmetic on corpora small enough to verify on paper;
  *   - exact score ties (same piece multiset, different order) break to
  *     the lexicographically-smallest path — the cross-engine rule the
  *     q112 oracle mirrors;
  *   - the character coverage floor keeps every word segmentable even
  *     when its characters are rare or unused by any path;
  *   - conservation on the real corpus: every Viterbi path
  *     re-concatenates to its word;
  *   - the training loop prunes to the target multi-char vocabulary
  *     while singles always survive.
  */
class UnigramLmSpec extends SparkSpec {

  test("one EM step matches hand-computed micro-nat scores") {
    val s = spark
    import s.implicits._
    // words: ab(f=2), b(f=1); pieces a(2), b(3), ab(2); T=7
    // lp(a) = round(ln(2/7)e6) = -1252763, lp(b) = -847298,
    // lp(ab) = -1252763; "ab" → [ab] (-1252763) beats [a b] (-2100061)
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val wf = UnigramLm.wordTable(docs, "text", maxWordLen = 16)
    val pieces = UnigramLm.quantize(UnigramLm.seedPieces(wf, 4, minCount = 1L))
    val lp = pieces.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(lp == Map("a" -> -1252763L, "b" -> -847298L, "ab" -> -1252763L),
      s"got $lp")
    val em = UnigramLm.emStep(wf, pieces, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(em == Map("ab" -> 2L, "b" -> 1L), s"got $em")
  }

  test("exact score ties break to the lexicographically-smallest path") {
    val s = spark
    import s.implicits._
    // "aaa": a(3), aa(2), aaa(1), T=6. ln(3/6)+ln(2/6) = ln(1/6), and
    // the micro-nat roundings land equal too (-1791759), so [a aa],
    // [aa a], and [aaa] all tie — the smallest path "a aa" must win
    // (space sorts below 'a' in UTF-8)
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val wf = UnigramLm.wordTable(docs, "text", maxWordLen = 16)
    val pieces = UnigramLm.quantize(UnigramLm.seedPieces(wf, 4, minCount = 1L))
    val path = UnigramLm.viterbiSegments(wf, pieces, 4)
      .select("path").head().getString(0)
    assert(path == "a aa", s"got $path")
  }

  test("character coverage floor keeps rare-char words segmentable") {
    val s = spark
    import s.implicits._
    // 'z'/'q' appear once — below minCount=2 — but singles are always
    // kept, so "zq" segments instead of disappearing
    val docs = Seq((1L, "zq ab ab ab")).toDF("doc_id", "text")
    val wf = UnigramLm.wordTable(docs, "text", maxWordLen = 16)
    val pieces = UnigramLm.quantize(UnigramLm.seedPieces(wf, 4, minCount = 2L))
    val paths = UnigramLm.viterbiSegments(wf, pieces, 4)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(paths("zq") == "z q", s"got $paths")
    assert(paths("ab") == "ab", s"got $paths")
  }

  test("conservation: every Viterbi path re-concatenates to its word on the real corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val wf = UnigramLm.wordTable(docs, "text", maxWordLen = 16)
    val pieces = UnigramLm.quantize(UnigramLm.seedPieces(wf, 4, minCount = 5L))
    val bad = UnigramLm.viterbiSegments(wf, pieces, 4)
      .filter(regexp_replace(col("path"), " ", "") =!= col("w"))
      .take(3)
    assert(bad.isEmpty, s"non-reconstructing: ${bad.mkString("; ")}")
  }

  test("two-batch merged word counts reproduce the whole-corpus segmentation") {
    // the family-wide incremental contract (BPE/DSIR/NgramLm symmetric):
    // training state is the mergeable word-count table — seeding,
    // scoring, and the Viterbi DP are all deterministic functions of it
    val docs = Tables.load(spark, sfDir, "documents")
    val h1 = docs.where(col("doc_id") % 2 === 0)
    val h2 = docs.where(col("doc_id") % 2 === 1)
    val mergedWf = graft.operators.NgramLm.mergeCounts(
        UnigramLm.wordTable(h1, "text", 16), UnigramLm.wordTable(h2, "text", 16))
    def segs(wf: org.apache.spark.sql.DataFrame) = {
      val pieces = UnigramLm.quantize(UnigramLm.seedPieces(wf, 4, minCount = 5L))
      UnigramLm.viterbiSegments(wf, pieces, 4)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    }
    assert(segs(mergedWf) == segs(UnigramLm.wordTable(docs, "text", 16)))
  }

  test("train prunes to the target multi-char vocab; singles always survive") {
    val docs = Tables.load(spark, sfDir, "documents")
    val vocab = UnigramLm.train(docs, "text", iters = 2, vocabTarget = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (singles, multis) = vocab.partition(_._1.length == 1)
    assert(multis.length <= 5, s"got ${multis.length} multis")
    assert(multis.nonEmpty)
    // every character of the corpus word table is present as a single
    val wf = UnigramLm.wordTable(docs, "text", maxWordLen = 16)
    val chars = wf.select(explode(split(col("w"), "")).as("ch"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(singles.map(_._1).toSet),
      s"missing singles: ${chars -- singles.map(_._1).toSet}")
    // scores are negative log-probs in micro-nats
    assert(vocab.forall(_._3 < 0L))
  }
}
