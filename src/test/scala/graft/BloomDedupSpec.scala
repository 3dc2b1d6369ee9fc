package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bloom, Dedup}
import graft.sources.Tables

/** Contracts for the bloom membership pre-test and the bloom-routed
  * incremental dedup:
  *   - NO false negatives: every key the filter was built over tests
  *     positive (this is what makes bloom-negative == definitely-novel
  *     sound);
  *   - false-positive rate near the configured fpp on disjoint keys;
  *   - exactAgainstIndexBloom returns EXACTLY what exactAgainstIndex
  *     returns — the bloom only routes, never decides.
  */
class BloomDedupSpec extends SparkSpec {

  private def hashes(lo: Long, hi: Long) =
    spark.range(lo, hi).select(md5(col("id").cast("string")).as("h"))

  test("bloom has no false negatives and ~fpp false positives") {
    val built = hashes(0, 20000)
    val bloom = Bloom.build(built, col("h"), expectedItems = 20000L, fpp = 0.01)
    val misses = built.filter(!Bloom.mightContain(bloom, col("h"))).count()
    assert(misses == 0L, s"$misses built keys tested negative (false negatives!)")
    val fp = hashes(20000, 40000)
      .filter(Bloom.mightContain(bloom, col("h"))).count()
    // fpp = 1% over 20k disjoint probes; 3% bound keeps the test
    // deterministic-in-practice without hiding a broken filter
    assert(fp < 600, s"$fp/20000 false positives — far above the 1% target")
  }

  test("bloom routes only ~(dups + fpp) of the batch to the confirm join") {
    // the 100 TB claim quantified: of a mostly-novel batch, only true
    // duplicates plus the configured false-positive rate may reach the
    // index anti-join; everything else is classified by the scalar
    // filter with zero index contact
    val d = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val index = Dedup.exact(d.filter(col("doc_id") < 25), "doc_id", "text")
      .select(col("content_hash"), col("keep_id"))
    val bloom = Bloom.build(index, col("content_hash"),
      expectedItems = 1000L, fpp = 0.01)
    // batch: the novel rest of the corpus plus 10 replayed dups of
    // indexed content
    val batch = d.filter(col("doc_id") >= 25)
      .unionByName(d.filter(col("doc_id") < 10)
        .select((col("doc_id") + 9000).as("doc_id"), col("text")))
      .select(col("doc_id"), graft.functions.Text.contentHash(col("text")).as("h"))
    val total = batch.count()
    val routed = batch.filter(Bloom.mightContain(bloom, col("h"))).count()
    val dups = 10L
    // fpp bound with headroom (deterministic hashes - no flake risk,
    // the margin documents intent, not variance)
    assert(routed >= dups, "true duplicates must always route to the confirm join")
    assert(routed <= dups + math.max(5L, (total * 0.05).toLong),
      s"bloom routed $routed of $total - far above dups + fpp")
  }

  test("build honors sizing beyond Spark's runtime-filter clamp") {
    // BloomFilterAggregate Math.min-clamps numBits to the
    // runtime-join-filter conf (default 67,108,864 bits = 8 MiB);
    // unhandled, a billion-key index silently degrades to fpp ~1.0.
    // Request a filter above the default cap and assert the serialized
    // size reflects the REQUEST, not the clamp.
    val built = hashes(0, 1000)
    val bloom = Bloom.build(built, col("h"), expectedItems = 20000000L, fpp = 0.01)
    val gotBits = bloom.length.toLong * 8
    assert(gotBits > 67108864L,
      s"filter has $gotBits bits - clamped to the runtime-filter default cap")
    // and it still answers membership correctly
    assert(built.filter(!Bloom.mightContain(bloom, col("h"))).count() == 0L)
    // conf restored to its default effective value (getOption reports
    // the default for unset confs, so compare values, not presence)
    assert(spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits") == "67108864")
  }

  test("build never touches the caller session's confs, even mid-build") {
    // The raised runtime-filter sizing lives on a private newSession()
    // clone: a concurrent query planning its own runtime join filters
    // on the CALLER's session must keep seeing the defaults for the
    // whole build window, not just after restoration.
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val defaults = (spark.conf.get(bitsKey), spark.conf.get(itemsKey))
    @volatile var deviation: Option[(String, String)] = None
    @volatile var stop = false
    val watcher = new Thread(() => {
      while (!stop) {
        val now = (spark.conf.get(bitsKey), spark.conf.get(itemsKey))
        if (now != defaults && deviation.isEmpty) deviation = Some(now)
        Thread.sleep(1)
      }
    })
    watcher.start()
    try {
      val bloom = Bloom.build(hashes(0, 50000), col("h"),
        expectedItems = 20000000L, fpp = 0.01)
      assert(bloom.length.toLong * 8 > 67108864L, "request must be honored")
    } finally { stop = true; watcher.join() }
    assert(deviation.isEmpty,
      s"caller session confs mutated during build: $deviation (defaults $defaults)")
    assert((spark.conf.get(bitsKey), spark.conf.get(itemsKey)) == defaults)
  }

  test("bloom-routed incremental dedup == plain incremental dedup") {
    val d = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") < 300)
    val index = Dedup.exact(corpus, "doc_id", "text")
      .select(col("content_hash"), col("keep_id"))
    val batch = d.filter(col("doc_id") >= 300)
      .unionByName(d.filter(col("doc_id") < 40)
        .select((col("doc_id") + 5000).as("doc_id"), col("text")))
    val bloom = Bloom.build(index, col("content_hash"), expectedItems = 1000L)
    val (s1, u1) = Dedup.exactAgainstIndex(batch, "doc_id", "text", index)
    val (s2, u2) = Dedup.exactAgainstIndexBloom(batch, "doc_id", "text", index, bloom)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty,
      "survivor sets differ between bloom and plain paths")
    assert(u1.exceptAll(u2).isEmpty && u2.exceptAll(u1).isEmpty,
      "updated indexes differ between bloom and plain paths")
  }
}
