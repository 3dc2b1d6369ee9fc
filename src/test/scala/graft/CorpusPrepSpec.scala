package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusPrep
import graft.sources.Tables

/** Structural properties of the corpus-preparation operators — the
  * invariants the oracle rows can't express directly. */
class CorpusPrepSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("chunking covers every token: sum of steps + last chunk == n_toks") {
    val chunks = CorpusPrep.chunkSliding(docs, "doc_id", "text", size = 32, stride = 24)
    val toks = docs.select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
    // per doc: max(chunk_id)*stride + last chunk_len must land exactly
    // at n_toks — no token dropped past the end, no phantom chunk
    val bad = chunks.groupBy("doc_id")
      .agg(max(col("chunk_id")).as("last_id"),
        max_by(col("chunk_len"), col("chunk_id")).as("last_len"),
        min(col("chunk_len")).as("min_len"))
      .join(toks, "doc_id")
      .filter(col("last_id") * 24 + col("last_len") =!= col("n_toks")
        || col("min_len") <= 0)
      .count()
    assert(bad == 0L)
    // overlap: every non-final chunk is exactly `size` long
    val shortMid = chunks.join(
        chunks.groupBy("doc_id").agg(max("chunk_id").as("last_id")), "doc_id")
      .filter(col("chunk_id") < col("last_id") && col("chunk_len") =!= 32)
      .count()
    assert(shortMid == 0L)
  }

  test("chunk_text round-trips: stride-prefixes of chunks reassemble the doc") {
    val chunks = CorpusPrep.chunkSliding(docs, "doc_id", "text", size = 16, stride = 16)
    // stride == size → zero overlap → concatenation restores the text
    // collect_list order is not defined through the aggregation shuffle —
    // sort the collected (chunk_id, text) pairs explicitly
    val rebuilt = chunks.groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
        s => s.getField("chunk_text")), " ").as("rebuilt"))
    val diff = rebuilt.join(docs, "doc_id")
      .filter(col("rebuilt") =!= col("text")).count()
    assert(diff == 0L)
  }

  test("packing: offsets advance by exactly n_toks within each shard") {
    val packed = CorpusPrep.packSequential(docs, "doc_id", "text",
      budget = 256, shardCol = pmod(col("doc_id"), lit(8)))
    val rows = packed.orderBy("shard", "doc_id").collect()
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      var cum = 0L
      rs.foreach { r =>
        assert(r.getAs[Long]("seq_id") == cum / 256)
        assert(r.getAs[Long]("offset") == cum % 256)
        cum += r.getAs[Int]("n_toks")
      }
    }
    // shard-local packing: every shard starts its own sequence 0
    assert(rows.groupBy(_.getAs[Long]("shard"))
      .forall { case (_, rs) => rs.map(_.getAs[Long]("seq_id")).min == 0L })
  }

  test("packManifest: contiguous disjoint spans, fill/pad arithmetic, oversize clamp") {
    val budget = 64
    val m = CorpusPrep.packManifest(docs, "doc_id", "text",
        budget = budget, shardCol = pmod(col("doc_id"), lit(8)))
      .collect()
    assert(m.nonEmpty)
    m.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin_id")))
      .foreach { case ((sh, bin), rs) =>
        val spans = rs.sortBy(_.getAs[Long]("start_tok"))
          .map(r => (r.getAs[Long]("start_tok"), r.getAs[Long]("end_tok")))
        // spans tile the bin front-to-back: each doc starts exactly
        // where the previous one ends (the attention-mask boundary
        // contract), first at 0
        assert(spans.head._1 == 0L, s"bin ($sh,$bin) starts at ${spans.head._1}")
        spans.sliding(2).foreach {
          case Array((_, e), (s2, _)) =>
            assert(s2 == e, s"gap/overlap in bin ($sh,$bin): $spans")
          case _ =>
        }
        // fill == last end; pad complements fill to the budget,
        // clamped at 0 for the declared single-oversize-doc bins
        val fill = rs.head.getAs[Long]("bin_fill")
        assert(rs.forall(_.getAs[Long]("bin_fill") == fill))
        assert(fill == spans.last._2)
        val pad = rs.head.getAs[Long]("n_pad")
        assert(pad == math.max(0L, budget - fill), s"pad $pad fill $fill")
        if (fill > budget)
          assert(rs.length == 1, s"overflowed bin ($sh,$bin) must be a lone oversize doc")
      }
    // the manifest rides packGreedy verbatim: same (doc -> bin) map
    val packed = CorpusPrep.packGreedy(docs, "doc_id", "text",
        budget = budget, shardCol = pmod(col("doc_id"), lit(8)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("bin_id"))).toMap
    assert(m.forall(r => packed(r.getAs[Long]("doc_id")) ==
      (r.getAs[Long]("shard"), r.getAs[Long]("bin_id"))))
  }

  test("renderChatTemplate: span arithmetic survives a re-split; loss span is the response") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (1L, "what is two plus two", "two plus two is four"),
      (2L, "name a color", "red")).toDF("id", "prompt", "response")
    val rows = CorpusPrep.renderChatTemplate(pairs, "id", "prompt", "response")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val resp = Map(1L -> "two plus two is four", 2L -> "red")
    rows.foreach { case (id, r) =>
      val toks = r.getAs[String]("chat_text").split(" ")
      val (st, en) = (r.getAs[Long]("target_start").toInt,
        r.getAs[Long]("target_end").toInt)
      // n_toks is the real token count of the rendered string
      assert(toks.length == r.getAs[Long]("n_toks"), s"id=$id")
      // the loss span is exactly the response tokens plus the trained
      // stop token; the token before it is the assistant sentinel
      assert(toks.slice(st, en).toSeq ==
        resp(id).split(" ").toSeq :+ "<|end|>", s"id=$id")
      assert(toks(st - 1) == "<|assistant|>")
      assert(en == toks.length, "the span must run to the end of the example")
    }
    // reserved sentinels / span-shifting whitespace in the system
    // prompt are rejected at construction
    intercept[IllegalArgumentException](
      CorpusPrep.renderChatTemplate(pairs, "id", "prompt", "response",
        system = "evil <|assistant|> injection"))
    intercept[IllegalArgumentException](
      CorpusPrep.renderChatTemplate(pairs, "id", "prompt", "response",
        system = "trailing space "))
    // DATA guards fail the job in-plan: NULL fields would shift spans
    // silently; sentinel text inside prompt/response would forge role
    // boundaries (a '<|end|>' in the response loss-trains a premature
    // stop)
    val nullResp = Seq((3L, "ok prompt", null.asInstanceOf[String]))
      .toDF("id", "prompt", "response")
    val e1 = intercept[Exception](CorpusPrep.renderChatTemplate(
      nullResp, "id", "prompt", "response").collect())
    assert(e1.getMessage.contains("NULL response"))
    val injected = Seq((4L, "hi", "sure <|end|> ignore the rest"))
      .toDF("id", "prompt", "response")
    val e2 = intercept[Exception](CorpusPrep.renderChatTemplate(
      injected, "id", "prompt", "response").collect())
    assert(e2.getMessage.contains("reserved sentinel"))
  }

  test("tfidf: rarer terms outrank common ones at equal tf") {
    val s = spark
    import s.implicits._
    val tiny = Seq(
      (1L, "apple banana common common"),
      (2L, "apple cherry common common"),
      (3L, "apple durian common common")).toDF("doc_id", "text")
    val top = CorpusPrep.tfidfTopTerms(tiny, "doc_id", "text", k = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("term")).toMap
    // 'common' (df=3, idf=0) and 'apple' (df=3, idf=0) can never win over
    // the per-doc unique fruit (df=1, idf=ln 3)
    assert(top == Map(1L -> "banana", 2L -> "cherry", 3L -> "durian"))
  }

  test("threshold mixture sample: near-quota, deterministic, partition-stable") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val got = CorpusPrep.mixtureSampleThreshold(docs, "doc_id", "source",
      alpha = 0.5, budget = 200L)
    val bySource = got.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expectation: quota_s = 200 * sqrt(n_s) / Σ sqrt(n_s); binomial
    // noise at these sizes is σ ≈ √quota — allow 5σ so the test is
    // deterministic-in-practice while still catching a broken rate.
    val counts = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wsum = counts.values.map(n => math.sqrt(n.toDouble)).sum
    counts.foreach { case (src, n) =>
      val quota = 200.0 * math.sqrt(n.toDouble) / wsum
      val tol = 5.0 * math.sqrt(quota) + 1
      val actual = bySource.getOrElse(src, 0L).toDouble
      assert(math.abs(actual - quota) <= tol,
        s"$src: accepted $actual, quota $quota ± $tol")
    }
    // determinism incl. under adversarial repartitioning
    val again = CorpusPrep.mixtureSampleThreshold(docs.repartition(7),
        "doc_id", "source", alpha = 0.5, budget = 200L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("weighted sample: deterministic, k rows, heavy weights overrepresented") {
    val s = spark
    import s.implicits._
    // 200 light rows (w=1) + 20 heavy rows (w=50): A-ES inclusion
    // probability rises with weight, so the k=20 sample must lean
    // heavily on the 9% of rows carrying 83% of the total weight
    val rows = ((0L until 200L).map(i => (i, 1L)) ++
        (200L until 220L).map(i => (i, 50L))).toDF("doc_id", "w")
    val got = CorpusPrep.weightedSample(rows, "doc_id", "w", k = 20, seed = "s1:")
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 20)
    val heavy = ids.count(_ >= 200L)
    assert(heavy >= 12, s"only $heavy of 20 heavy rows sampled: $ids")
    // a pure function of (seed, id, w): the same call returns the same
    // set, a different seed redraws it
    val again = CorpusPrep.weightedSample(rows, "doc_id", "w", k = 20, seed = "s1:")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
    val redrawn = CorpusPrep.weightedSample(rows, "doc_id", "w", k = 20, seed = "s2:")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(redrawn != ids)
  }

  test("weighted sample key matches the hand-computed A-ES formula") {
    val s = spark
    import s.implicits._
    val rows = Seq((7L, 4L), (8L, 2L)).toDF("doc_id", "w")
    val got = CorpusPrep.weightedSample(rows, "doc_id", "w", k = 2, seed = "z:")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def key(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"z:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1L).toDouble / 4503599627370496.0d
      BigDecimal(math.log(u) / w.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(7L) == key(7L, 4L), s"got $got expect ${key(7L, 4L)}")
    assert(got(8L) == key(8L, 2L), s"got $got expect ${key(8L, 2L)}")
  }

  test("strideInterleave: exact keys and the within-one-of-target prefix mix") {
    val s = spark
    import s.implicits._
    // alpha = 1 ⇒ weights are the raw sizes: A(4 docs, w=4), B(1, w=1)
    val in = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"), (5L, "B"))
      .toDF("doc_id", "source")
    val out = CorpusPrep.strideInterleave(in, "doc_id", "source",
        alpha = 1.0, seed = "t:")
      .select("source", "rk", "key_fp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // keys: A rk∈1..4 → (rk−.5)/4 ⇒ 125000, 375000, 625000, 875000;
    //       B rk=1   → .5/1      ⇒ 500000
    assert(out.filter(_._1 == "A").map(_._3).sorted.toSeq ===
      Seq(125000L, 375000L, 625000L, 875000L))
    assert(out.filter(_._1 == "B").map(_._3).toSeq === Seq(500000L))
    // stride guarantee: every prefix of the key-ordered stream holds
    // each source within one document of its target share
    val ordered = out.sortBy(x => (x._3, x._1)).map(_._1)
    for (p <- 1 to ordered.length) {
      val nA = ordered.take(p).count(_ == "A")
      assert(math.abs(nA - p * 0.8) <= 1.0, s"prefix $p drifted: $nA A's")
    }
    // determinism: same seed same keys; the rank order within a source
    // is the seeded-md5 shuffle, not doc_id order
    val again = CorpusPrep.strideInterleave(in.repartition(3), "doc_id",
        "source", alpha = 1.0, seed = "t:")
      .select("source", "rk", "key_fp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_.toString).toSeq === again.sortBy(_.toString).toSeq)
  }

  test("vocabCoverage: histogram walk matches the hand-ranked curve") {
    val s = spark
    import s.implicits._
    // counts: a=6, b=3, c=1 → N=10; ranked curve (a)0.6 (ab)0.9 (abc)1.0
    val docs = Seq((1L, "a a a a a a b"), (2L, "b b c")).toDF("doc_id", "text")
    val got = CorpusPrep.vocabCoverage(docs, "text", Seq(50, 90, 95, 100))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((50, 1L, 0.6), (90, 2L, 0.9), (95, 3L, 1.0),
      (100, 3L, 1.0)), s"got $got")
    // boundary INSIDE a multi-term count class: a=3 b=3 c=2 d=1 (N=9);
    // p=34 needs ceil(3.06/3)=2 terms of the 3-class, p=33 only 1
    val docs2 = Seq((1L, "a a a b b b c c d")).toDF("doc_id", "text")
    val got2 = CorpusPrep.vocabCoverage(docs2, "text", Seq(33, 34))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got2 == Set((33, 1L, 0.333333), (34, 2L, 0.666667)), s"got $got2")
  }

  test("packGreedy: no doc straddles a bin; fills replay the greedy fold") {
    val budget = 64
    val packed = CorpusPrep.packGreedy(docs, "doc_id", "text",
      budget = budget, shardCol = pmod(col("doc_id"), lit(8)))
      .orderBy("shard", "doc_id").collect()
    assert(packed.nonEmpty)
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      var binId = 0L
      var fill = 0L
      var first = true
      rs.foreach { r =>
        val n = r.getAs[Long]("n_toks")
        if (!first && fill + n > budget) { binId += 1L; fill = 0L }
        first = false
        assert(r.getAs[Long]("bin_id") == binId, r.toString)
        assert(r.getAs[Long]("offset") == fill, r.toString)
        fill += n
      }
    }
    // the no-split contract: every doc that FITS the budget ends
    // inside its bin; only oversize docs may overflow, always alone
    // at offset 0
    packed.foreach { r =>
      val n = r.getAs[Long]("n_toks")
      if (n <= budget) assert(r.getAs[Long]("offset") + n <= budget)
      else assert(r.getAs[Long]("offset") == 0L)
    }
  }

  test("packGreedy: oversize doc gets its own bin; empty docs never open one") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c"),                      // 3 toks → bin 0
      (2L, ("x " * 9).trim),              // 9 toks > budget 8 → bin 1, alone
      (3L, "d e"),                        // bin 2 (bin 1 is overflowed)
      (4L, ""),                           // "" splits to [""] → 1 token
      (5L, "f g h i j")                   // 5 toks: 2+1+5=8 fits bin 2
    ).toDF("doc_id", "text")
    val got = CorpusPrep.packGreedy(docs, "doc_id", "text",
        budget = 8, shardCol = lit(0))
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("bin_id"), r.getAs[Long]("offset")))
    assert(got.toSeq == Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L),
      (4L, 2L, 2L), (5L, 2L, 3L)), got.mkString(","))
    // degenerate [oversize, 0-token, oversize]: the 0-token doc closes
    // the overflowed bin (leaving fill 0), and the NEXT oversize doc
    // still opens a fresh bin — the oracle recurrence closes on
    // overflow unconditionally after a shard's first document
    val deg = Seq((1L, 9L), (2L, 0L), (3L, 9L)).toDF("doc_id", "n")
    val got2 = CorpusPrep.packGreedyByLen(deg, "doc_id", "n",
        budget = 8, shardCol = lit(0))
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("bin_id"), r.getAs[Long]("offset")))
    assert(got2.toSeq == Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L)),
      got2.mkString(","))
  }

  test("spanCorrupt: splicing targets back over sentinels restores the doc") {
    val out = CorpusPrep.spanCorrupt(docs, "doc_id", "text",
      block = 16, spanLen = 2, seed = "sc1:").collect()
    val originals = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.length == originals.size)
    out.foreach { r =>
      val (id, in, tgt, nMasked) = (r.getAs[Long]("doc_id"),
        r.getAs[String]("input_text"), r.getAs[String]("target_text"),
        r.getAs[Long]("n_masked"))
      // corruption rate: exactly spanLen tokens per complete block
      val n = originals(id).split(" ", -1).length
      assert(nMasked == 2L * (n / 16), s"doc $id: $nMasked masked for $n toks")
      // target spans keyed by sentinel id
      val parts = if (tgt.isEmpty) Array.empty[String]
        else tgt.split("<extra_id_").filter(_.nonEmpty)
      val byId = parts.map { p =>
        val idx = p.substring(0, p.indexOf('>'))
        val toks = p.substring(p.indexOf('>') + 1).trim.split(" ")
        s"<extra_id_$idx>" -> toks
      }.toMap
      val rebuilt = in.split(" ", -1).flatMap { t =>
        if (t.startsWith("<extra_id_")) byId(t) else Array(t)
      }.mkString(" ")
      assert(rebuilt == originals(id), s"doc $id failed round-trip")
    }
  }

  test("lengthQuantiles: histogram walk matches the ranked definition") {
    val s = spark
    import s.implicits._
    // group g: lengths 1,2,2,4 (n=4). ranks: 1→1, 2→2,3, 4→4.
    // p50 → rank ceil(2) = 2 → len 2; p75 → rank 3 → len 2;
    // p76 → 100·cum ≥ 76·4=304 → cum ≥ 3.04 → cum 4 → len 4; p100 → 4
    val docs = Seq(
      ("g", "a"), ("g", "a b"), ("g", "c d"), ("g", "a b c d"),
      ("h", "x")).toDF("source", "text")
    val got = CorpusPrep.lengthQuantiles(docs, "source", "text",
        ps = Seq(50, 75, 76, 100))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(
      ("g", 50, 2L), ("g", 75, 2L), ("g", 76, 4L), ("g", 100, 4L),
      ("h", 50, 1L), ("h", 75, 1L), ("h", 76, 1L), ("h", 100, 1L)),
      s"got $got")
  }

  test("mlmMask: length-preserving, ~15% selection, labels count matches") {
    val out = CorpusPrep.mlmMask(docs, "doc_id", "text", seed = "mlm1:")
      .collect()
    val originals = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.length == originals.size)
    var selected = 0L
    var total = 0L
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val mlm = r.getAs[String]("mlm_text").split(" ", -1)
      val orig = originals(id).split(" ", -1)
      val labels = r.getAs[String]("labels_text")
      val nMasked = r.getAs[Long]("n_masked")
      assert(mlm.length == orig.length, s"doc $id changed length")
      // labels hold exactly the selected positions' original tokens
      val nLabels = if (labels.isEmpty) 0 else labels.split(" ", -1).length
      assert(nLabels == nMasked, s"doc $id: $nLabels labels for $nMasked")
      // positions that differ from the original were necessarily selected
      val differing = mlm.zip(orig).count { case (a, b) => a != b }
      assert(differing <= nMasked, s"doc $id mutated unselected positions")
      selected += nMasked
      total += orig.length
    }
    val rate = selected.toDouble / total
    assert(rate > 0.10 && rate < 0.20, s"selection rate $rate outside band")
    val again = CorpusPrep.mlmMask(docs.repartition(5), "doc_id", "text",
      seed = "mlm1:").collect().map(_.toString).sorted.toSeq
    assert(again == out.map(_.toString).sorted.toSeq)
    // vocabK larger than the corpus's distinct-token count: the
    // replacement draw must wrap at the ACTUAL vocabulary size, never
    // index past it (which would silently delete positions through
    // the null-dropping reassembly)
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, ("a b " * 40).trim), (2L, ("b c " * 40).trim))
      .toDF("doc_id", "text")
    CorpusPrep.mlmMask(tiny, "doc_id", "text", seed = "m2:",
        vocabK = 30000)
      .collect().foreach { r =>
        assert(r.getAs[String]("mlm_text").split(" ", -1).length == 80,
          r.toString)
      }
  }

  test("fimTransform: PSM parts reassemble the doc; lengths partition n") {
    val out = CorpusPrep.fimTransform(docs, "doc_id", "text", seed = "fim1:")
      .collect()
    val originals = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.length == originals.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val fim = r.getAs[String]("fim_text")
      assert(fim.startsWith("<PRE> "))
      val sufAt = fim.indexOf(" <SUF> ")
      val midAt = fim.indexOf(" <MID> ")
      assert(sufAt > 0 && midAt > sufAt)
      val pre = fim.substring("<PRE> ".length, sufAt)
      val suf = fim.substring(sufAt + " <SUF> ".length, midAt)
      val mid = fim.substring(midAt + " <MID> ".length)
      val rebuilt = Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == originals(id), s"doc $id failed PSM round-trip")
      val n = originals(id).split(" ", -1).length.toLong
      assert(r.getAs[Long]("n_prefix") + r.getAs[Long]("n_middle") +
        r.getAs[Long]("n_suffix") == n)
    }
    // cuts are a pure function of (seed, id): partition layout is moot
    val again = CorpusPrep.fimTransform(docs.repartition(5), "doc_id",
      "text", seed = "fim1:").collect().map(_.toString).sorted.toSeq
    assert(again == out.map(_.toString).sorted.toSeq)
  }

  test("packGreedyResume: resumed pack equals the whole-corpus pack") {
    val budget = 96
    val lens = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val shard = pmod(col("doc_id"), lit(8))
    // append-only split: batch 2 strictly after batch 1 in id order
    val b1 = lens.filter(col("doc_id") < 250)
    val b2 = lens.filter(col("doc_id") >= 250)
    val whole = CorpusPrep.packGreedyByLen(lens, "doc_id", "n",
      budget, shard).collect().map(_.toString).sorted.toSeq
    val first = CorpusPrep.packGreedyByLen(b1, "doc_id", "n", budget, shard)
    val state = CorpusPrep.packTailState(first, "n")
    val resumed = CorpusPrep.packGreedyResume(b2, "doc_id", "n",
      budget, shard, state)
    val together = (first.collect() ++ resumed.collect())
      .map(_.toString).sorted.toSeq
    assert(together == whole,
      "resume from tail state must reproduce the whole-corpus pack")
    // resuming against an EMPTY state packs from scratch
    val empty = state.filter(lit(false))
    val scratch = CorpusPrep.packGreedyResume(b1, "doc_id", "n",
      budget, shard, empty).collect().map(_.toString).sorted.toSeq
    assert(scratch == first.collect().map(_.toString).sorted.toSeq)
  }

  test("chunkContentDefined: boundaries are shift-stable; chunks tile the doc") {
    val s = spark
    import s.implicits._
    // chunks reassemble every doc exactly
    val out = CorpusPrep.chunkContentDefined(docs, "doc_id", "text", 16)
    val rebuilt = out.groupBy("doc_id")
      .agg(array_join(graft.functions.Text.inPositionOrder(
        collect_list(struct(col("chunk_id"), col("chunk_text"))),
        "chunk_text"), " ").as("rebuilt"))
    assert(rebuilt.join(docs, "doc_id")
      .filter(col("rebuilt") =!= col("text")).count() == 0L)
    // THE content-defined property: prepending tokens to a document
    // shifts early chunks but every chunk whose content lies past the
    // perturbation re-appears VERBATIM — fixed-window chunking (q53)
    // re-cuts everything instead
    // longest doc → several chunks on both sides of the comparison
    val doc = docs.orderBy(col("n_chars").desc, col("doc_id")).limit(1)
      .collect()(0).getAs[String]("text")
    val shifted = ("zqx1 zqx2 zqx3 zqx4 zqx5 " + doc)
    val pair = Seq((1L, doc), (2L, shifted)).toDF("doc_id", "text")
    val chunks = CorpusPrep.chunkContentDefined(pair, "doc_id", "text", 16)
      .collect()
    val c1 = chunks.filter(_.getLong(0) == 1L).map(_.getString(2)).toSet
    val c2 = chunks.filter(_.getLong(0) == 2L).map(_.getString(2)).toSet
    val shared = c1.intersect(c2)
    // all original chunks except (at most) the first re-appear
    assert(shared.size >= c1.size - 1,
      s"only ${shared.size} of ${c1.size} chunks survived the shift")
    // and fixed-window chunking indeed destroys them (sanity contrast)
    val f = CorpusPrep.chunkSliding(pair, "doc_id", "text", 16, 16)
      .collect()
    val f1 = f.filter(_.getLong(0) == 1L).map(_.getString(2)).toSet
    val f2 = f.filter(_.getLong(0) == 2L).map(_.getString(2)).toSet
    assert(f1.intersect(f2).size < shared.size)
  }

  test("selectToBudget: class decomposition equals the ranked prefix scan") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, 2.0, 5L), (2L, 2.0, 5L),      // one score class, cum 5, 10
      (3L, 1.0, 4L), (4L, 1.0, 6L),      // next class, cum 14, 20
      (5L, 1.5, 0L)                      // zero-length, cum 10 exactly
    ).toDF("doc_id", "score", "n")
    def sel(b: Long) = CorpusPrep.selectToBudget(rows, "doc_id", "score",
      "n", b).collect().map(_.getLong(0)).toSet
    // ranked order: 1, 2, (5 len 0 at cum 10), 3, 4
    assert(sel(13L) == Set(1L, 2L, 5L))
    assert(sel(14L) == Set(1L, 2L, 5L, 3L))
    assert(sel(9L) == Set(1L))           // boundary inside a class
    assert(sel(10L) == Set(1L, 2L, 5L))  // zero-length doc at exact budget
    assert(sel(0L) == Set.empty[Long])
    assert(sel(100L) == Set(1L, 2L, 3L, 4L, 5L))
    // partition-layout stable
    val a = CorpusPrep.selectToBudget(rows.repartition(3), "doc_id",
      "score", "n", 14L).collect().map(_.getLong(0)).toSet
    assert(a == sel(14L))
  }

  test("property: resume-chain equality over randomized corpora and splits") {
    val s = spark
    import s.implicits._
    // fixed seed → deterministic trials; lens include 0 and oversize
    // (the degenerate cases the greedy recurrence must keep in lockstep
    // with the oracle and with packGreedyResume)
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val nDocs = 30 + rnd.nextInt(60)
      val budget = 8 + rnd.nextInt(40)
      val nShards = 1 + rnd.nextInt(4)
      val lens = (1L to nDocs).map { i =>
        val r = rnd.nextInt(10)
        val n = if (r == 0) 0L                        // zero-token doc
                else if (r == 1) budget + 1L + rnd.nextInt(10) // oversize
                else 1L + rnd.nextInt(budget)
        i -> n
      }
      val shard = pmod(col("doc_id"), lit(nShards))
      val all = lens.toDF("doc_id", "n")
      val whole = CorpusPrep.packGreedyByLen(all, "doc_id", "n",
        budget, shard).collect().map(_.toString).sorted.toSeq
      // split into three consecutive batches at random cut points and
      // pack incrementally through the merged tail state
      val c1 = 1 + rnd.nextInt(nDocs - 2)
      val c2 = c1 + 1 + rnd.nextInt(nDocs - c1 - 1)
      val batches = Seq(
        lens.filter(_._1 <= c1), lens.filter(x => x._1 > c1 && x._1 <= c2),
        lens.filter(_._1 > c2)).map(_.toDF("doc_id", "n"))
      var state = Seq.empty[(Long, Long, Long)]
        .toDF("shard", "bin_id", "fill")
      val pieces = batches.map { b =>
        val packed = CorpusPrep.packGreedyResume(b, "doc_id", "n",
          budget, shard, state)
        state = CorpusPrep.packTailStateMerged(packed, "n", state)
        packed.collect()
      }
      val together = pieces.flatten.map(_.toString).sorted.toSeq
      assert(together == whole,
        s"trial $trial (n=$nDocs budget=$budget shards=$nShards " +
          s"cuts=$c1,$c2): resumed chain != whole pack")
    }
  }

  test("packBestFitDecreasing: hand-traced placements; tightest-fit wins") {
    val s = spark
    import s.implicits._
    // budget 10, lengths 7,6,4,3,2 → 7 opens b0; 6 opens b1 (7+6>10);
    // 4 best-fits b1 (6+4=10 beats nothing else); 3 best-fits b0
    // (7+3=10); 2 fits nowhere → b2
    val lens = Seq((1L, 7L), (2L, 6L), (3L, 4L), (4L, 3L), (5L, 2L))
      .toDF("doc_id", "n")
    val got = CorpusPrep.packBestFitDecreasing(lens, "doc_id", "n",
        budget = 10, shardCol = lit(0))
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("bin_id"), r.getAs[Long]("offset")))
    assert(got.toSeq == Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 1L, 6L),
      (4L, 0L, 7L), (5L, 2L, 0L)), got.mkString(","))
  }

  test("packBestFitDecreasing: no straddle, dense bins, layout-stable") {
    val budget = 96
    val lens = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val packed = CorpusPrep.packBestFitDecreasing(lens, "doc_id", "n",
      budget, pmod(col("doc_id"), lit(8))).collect()
    assert(packed.length == docs.count())
    packed.foreach { r =>
      val n = r.getAs[Long]("n")
      if (n <= budget)
        assert(r.getAs[Long]("offset") + n <= budget, r.toString)
      else assert(r.getAs[Long]("offset") == 0L, r.toString)
    }
    // per (shard, bin): fills are consistent — offsets tile [0, fill)
    packed.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin_id")))
      .foreach { case (_, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("offset"))
        var cum = 0L
        sorted.foreach { r =>
          assert(r.getAs[Long]("offset") == cum, r.toString)
          cum += r.getAs[Long]("n")
        }
      }
    val again = CorpusPrep.packBestFitDecreasing(lens.repartition(3),
        "doc_id", "n", budget, pmod(col("doc_id"), lit(8)))
      .collect().map(_.toString).sorted.toSeq
    assert(again == packed.map(_.toString).sorted.toSeq)
  }

  test("packGreedy: assignment is identical across partition layouts") {
    val a = CorpusPrep.packGreedy(docs, "doc_id", "text",
      budget = 96, shardCol = pmod(col("doc_id"), lit(8)))
      .collect().map(_.toString).sorted.toSeq
    val b = CorpusPrep.packGreedy(docs.repartition(3), "doc_id", "text",
      budget = 96, shardCol = pmod(col("doc_id"), lit(8)))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
