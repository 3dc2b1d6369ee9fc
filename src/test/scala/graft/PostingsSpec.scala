package graft

import org.apache.spark.sql.functions._
import graft.operators.Postings

/** Positional inverted index + phrase search (q141). */
class PostingsSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "brown fox and the quick brown fox"),
      (3L, "quick brown quick brown quick"),
      (4L, "Fox  THE quick") // normalization: case + runs of spaces
    ).toDF("doc_id", "text")
  }

  test("build emits 0-based normalized positions") {
    val idx = Postings.build(docs, "doc_id", "text")
    val d4 = idx.filter(col("doc_id") === 4L)
      .collect().map(r => (r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(d4.toSeq == Seq((0, "fox"), (1, "the"), (2, "quick")))
  }

  test("phraseOccurrences counts overlapping occurrences per doc") {
    val idx = Postings.build(docs, "doc_id", "text")
    val got = Postings.phraseOccurrences(idx, Seq("quick", "brown", "fox"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L), s"got $got")
    // overlapping repeats: "quick brown" twice in doc 3
    val qb = Postings.phraseOccurrences(idx, Seq("quick", "brown"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(qb == Map(1L -> 1L, 2L -> 1L, 3L -> 2L), s"got $qb")
    // a repeated-token phrase joins the same posting list twice
    val qq = Postings.phraseOccurrences(idx, Seq("quick", "brown", "quick"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(qq == Map(3L -> 2L), s"got $qq")
    // absent phrase → empty, not an error
    assert(Postings.phraseOccurrences(idx, Seq("missing", "phrase")).count() == 0)
  }

  test("topNgram derives the most frequent n-gram with desc/asc tiebreak") {
    // "quick brown" 4× (doc 3 twice) beats "brown fox" 3×
    assert(Postings.topNgram(docs, "text", n = 2) == Seq("quick", "brown"))
    // tie between "a b" (2×) and "b a" (2×): text-ascending wins
    val s = spark
    import s.implicits._
    val tie = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    assert(Postings.topNgram(tie, "text", n = 2) == Seq("a", "b"))
  }
}
