package graft

/** Plan-shape regression guard: the PLANS.md audit promises no
  * accidental all-pairs joins anywhere in the declared surface. This
  * pins that property so a refactor that silently degrades an equi-join
  * into BroadcastNestedLoopJoin/CartesianProduct fails the suite, not
  * a later round's audit. The allowlist is the documented set whose
  * nested loop IS the design (tiny broadcast side or exact-baseline
  * semantics — see PLANS.md).
  */
class PlanInvariantsSpec extends SparkSpec {

  private val declaredNestedLoop = Set(
    "q10_join_theta",          // theta demo on a 3-row bucket table
    "q29_custom_expr_cosine",  // small filtered pair set, broadcast
    "q37_embed_knn",           // exact-kNN baseline: broadcast query batch
    "q84_knn_classify",        // same broadcast-query-batch kNN scan
    "q55_tfidf_top_terms",     // 1-row corpus-total broadcast (IDF)
    "q67_unigram_logprob",     // 1-row corpus-total broadcast
    "q100_dsir_importance",    // 1-row smoothing-totals broadcast
    "q101_bigram_perplexity",  // 1-row vocabulary-count broadcast
    "q118_kneser_ney",         // 1-row bigram-type-total broadcast
    "q123_jl_ann",             // broadcast query batch over the skinny projection (q37's shape)
    "q138_pq_ann",             // broadcast query batch over the codes-only scan (q37's shape)
    "q170_pq_index",           // same ADC shortlist shape as q138, served from the persisted codes
    "q174_ann_serve",          // q171's probe shape against the session-cached index
    "q179_serve_flagship",     // embeds q174's probe (ADC broadcast-query scan)
    "q102_semantic_decontaminate", // broadcast eval probe set (q37's shape)
    "q111_collocations",       // 1-row corpus-total broadcast (score scale)
    "q113_phrases_iterated",   // same 1-row total broadcast, final pass
    "q124_bm25_topk",          // 1-row (n_docs, avgdl) corpus-stats broadcast
    "q127_doremi_mixture",     // 1-row corpus-total + loss-total broadcasts
    "q128_rm3_expansion",      // q124's corpus-stats broadcast inside topK
    "q129_rrf_fusion",         // 10-row broadcast prior × 3 probe ids
    "q136_domain_divergence",  // 1-row corpus-total broadcast
    "q160_cooccurrence_pmi")   // 1-row token-total broadcast (q111's shape)

  test("no undeclared nested-loop or cartesian join in any query plan") {
    val offenders = SparkEntry.all.flatMap { q =>
      val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
      val nested = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")
      if (nested && !declaredNestedLoop(q.name)) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"undeclared nested-loop joins in: ${offenders.mkString(", ")}")
  }

  // Queries whose PLANS.md story is "one zero-shuffle projection" — a
  // refactor that sneaks an Exchange into one of these breaks its
  // 100 TB claim, so pin it.
  private val declaredZeroShuffle = Set(
    "q02_filter_project", "q30_text_stats", "q35_fingerprint",
    "q44_scalar_breadth", "q50_strings2", "q68_pii_scan",
    "q74_pii_redact", "q77_quality_signals", "q82_repetition_signals",
    "q86_embed_quantize", "q122_jl_projection",
    "q133_token_entropy", "q134_compression_ratio",
    "q144_blocklist_filter", "q146_phrase_blocklist",
    "q153_fim_transform", "q168_chat_template")

  test("declared zero-shuffle projections have no Exchange in their plan") {
    val offenders = SparkEntry.all
      .filter(q => declaredZeroShuffle(q.name)).flatMap { q =>
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("Exchange")) Some(q.name) else None
      }
    assert(offenders.isEmpty,
      s"zero-shuffle queries grew an Exchange: ${offenders.mkString(", ")}")
  }

  test("q147 packs through ONE fixed-width exchange; text never crosses") {
    // packGreedy's 100 TB story: the greedy fold runs on (id, shard,
    // n_toks) rows — the corpus text is projected away BEFORE the
    // shard exchange, so the shuffle is ~20 bytes/doc no matter how
    // wide the documents are. A refactor that repartitions before the
    // projection would silently ship the full text; only the plan can
    // guard that.
    // sparkPlan, not executedPlan: AQE's wrapper node hides the
    // exchange from collect() until the query has actually run
    val plan = SparkEntry.all.find(_.name == "q147_pack_greedy").get
      .fn(spark, sfDir).queryExecution.sparkPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size == 1, s"expected ONE shuffle, got ${exchanges.size}")
    assert(!exchanges.head.child.output.exists(_.name == "text"),
      s"text column crossed the pack exchange: ${exchanges.head.child.output}")
  }

  test("ANN shortlist windows keep the PARTIAL WindowGroupLimit below the exchange") {
    // The 100 TB top-k claim for the ANN family rests on Spark's
    // InferWindowGroupLimit planning `row_number() <= k` as a
    // partial-mode WindowGroupLimit BELOW the per-query exchange:
    // each input partition forwards at most k/nCand candidate rows per
    // query, so the shuffle moves O(partitions × k) rows, not the whole
    // scored corpus, and no single query's candidates funnel uncut
    // into one partition. That is optimizer behavior, not code we
    // wrote — an expression change that defeats the rule (e.g. a
    // non-deterministic column in the order spec) would silently turn
    // the shortlist into a full per-query shuffle while returning the
    // same rows. Pin the Partial node count per plan: one per
    // rank-cut window (q37 brute-force has one; q138's ADC shortlist
    // and q171's IVFPQ probe each cut a candidate window AND the final
    // rescore window).
    import org.apache.spark.sql.execution.window.{Partial, WindowGroupLimitExec}
    val expected = Seq("q37_embed_knn" -> 1, "q138_pq_ann" -> 2,
      "q171_ann_ivfpq" -> 2)
    expected.foreach { case (name, nPartial) =>
      // sparkPlan, not executedPlan: AQE hides the shape until run
      val plan = SparkEntry.all.find(_.name == name).get
        .fn(spark, sfDir).queryExecution.sparkPlan
      val partials = plan.collect {
        case w: WindowGroupLimitExec if w.mode == Partial => w
      }
      assert(partials.size == nPartial,
        s"$name: expected $nPartial partial-mode WindowGroupLimit nodes, " +
          s"got ${partials.size} —\n$plan")
    }
  }

  test("q92 keeps the bloom pre-test in front of the index anti-join") {
    // the 100 TB story is bloom-negative == zero index contact; a
    // refactor that drops the might_contain routing would still return
    // identical rows (the confirm join is exact), so only the PLAN can
    // regression-guard it
    val plan = SparkEntry.all.find(_.name == "q92_dedup_bloom").get
      .fn(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "q92's plan lost the bloom might_contain pre-filter")
  }
}
