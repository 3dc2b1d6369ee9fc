package graft

import graft.operators.Novelty

/** Per-document n-gram novelty — first-seen attribution (q142). */
class NoveltySpec extends SparkSpec {

  test("first-seen attribution: copies score zero, fresh docs score one") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d e"),     // all 3 trigrams first seen here → 1.0
      (2L, "a b c d e"),     // exact copy, later id → 0.0
      (3L, "a b c x y z"),   // "a b c" seen in doc 1; 3 of 4 novel
      (4L, "p q")            // < 3 tokens → no shingles → absent
    ).toDF("doc_id", "text")
    val got = Novelty.ngramNovelty(df, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((3L, 3L, 1.0)))
    assert(got(2L) == ((3L, 0L, 0.0)))
    assert(got(3L) == ((4L, 3L, 0.75)))
  }

  test("plan: one corpus scan, two exchanges, no join") {
    val s = spark
    import s.implicits._
    val df = (1L to 50L).map(i => (i, s"w$i x$i y$i z$i w$i")).toDF("doc_id", "text")
    val q = Novelty.ngramNovelty(df, "doc_id", "text", n = 3)
    q.collect() // force the final adaptive plan
    // keep only the final adaptive plan (toString appends the initial
    // plan after a marker, which would double-count every node)
    val plan = q.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    // window-min over the shingle partition replaces the join-back
    // formulation (which scans+explodes the corpus twice and needs a
    // third exchange that ReuseExchange cannot dedupe)
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    assert(plan.split("Generate explode").length - 1 == 1,
      s"corpus should be shingled exactly once:\n$plan")
    assert(plan.split("Exchange hashpartitioning").length - 1 == 2,
      s"expected exactly two exchanges (sh window, id agg):\n$plan")
  }

  test("novelty counts distinct shingles once (repeats inside a doc)") {
    val s = spark
    import s.implicits._
    // "a b a b a b" has trigrams [a b a, b a b, a b a, b a b] → 2 distinct
    val df = Seq((7L, "a b a b a b")).toDF("doc_id", "text")
    val r = Novelty.ngramNovelty(df, "doc_id", "text", n = 3).head()
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) == ((2L, 2L, 1.0)))
  }
}
