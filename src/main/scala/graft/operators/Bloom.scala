package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumn}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership pre-tests over key columns, built on
  * Spark's own Catalyst bloom expressions (`BloomFilterAggregate` /
  * `BloomFilterMightContain` — the machinery behind Spark's injected
  * runtime join filters, reached through the [[GraftColumn]] bridge,
  * so both build and probe run inside whole-stage codegen; no UDFs,
  * no driver-side hashing).
  *
  * The 100 TB pattern this enables (see
  * [[Dedup.exactAgainstIndexBloom]]): a membership anti-join against a
  * billions-row historical index processes the WHOLE probe side, but a
  * bloom filter of the index keys classifies most probes without
  * touching the index at all — a bloom negative is DEFINITELY novel
  * (no false negatives), so only bloom positives (true duplicates +
  * the configured false-positive rate) continue to the exact confirm
  * join. At a typical 1–10% duplicate rate the join input shrinks
  * ~10–100×, and the result stays EXACT because positives are
  * confirmed against the real index.
  *
  * Sizing: bits/key ≈ −1.44 log2(fpp); 1e9 keys at 1% fpp ≈ 1.2 GiB.
  * The serialized filter ships with the task binary like any broadcast
  * — size `fpp` accordingly, and prefer maintaining the filter as a
  * persisted artifact next to the index so it is built once per epoch,
  * not once per batch.
  */
object Bloom {

  /** Number of filter bits for `n` expected keys at false-positive
    * rate `fpp` (the standard bloom formula, floored at one byte). */
  def numBits(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0.0 && fpp < 1.0)
    math.max(8L, math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
  }

  /** Build the serialized bloom filter of `key` over every row of
    * `df`. One partial-aggregate pass (map-side partial filters OR'd
    * in the final step); the single driver-side `head()` retrieves one
    * row holding the filter bytes — bounded by the sized filter, the
    * same envelope as any broadcast build.
    *
    * `BloomFilterAggregate` silently clamps its sizing with `Math.min`
    * against the runtime-join-filter confs (defaults: 4M items,
    * 67,108,864 bits = 8 MiB) — sized for Spark's own injected join
    * filters, not for a billion-key index, where a clamped filter
    * degrades fpp toward 1.0 and the pre-test stops filtering
    * anything. The confs are raised to the requested sizing on a
    * PRIVATE session clone (`newSession()` — same SparkContext,
    * session-scoped SQLConf) that runs only this aggregate, so
    * concurrent queries on the caller's session never observe the
    * inflated runtime-filter sizing and two concurrent builds cannot
    * clobber each other's values (BloomDedupSpec pins both that an
    * over-default request really gets its bits and that the caller's
    * confs stay untouched). */
  def build(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bits = numBits(expectedItems, fpp)
    val session = df.sparkSession.newSession()
    session.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      math.max(expectedItems, 4000000L).toString)
    session.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
      math.max(bits, 67108864L).toString)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftColumn.expr(key))),
      Literal(expectedItems), Literal(bits))
    val bytes = GraftColumn.inSession(session, df)
      .agg(GraftColumn.of(agg.toAggregateExpression()).as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
    // the aggregate yields NULL over zero rows (a fresh/empty index —
    // the first run of an incremental pipeline); an empty filter of
    // the same sizing is the correct value, and the serialization
    // formats match (both are util.sketch.BloomFilter writeTo/readFrom)
    if (bytes != null) bytes
    else {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.spark.util.sketch.BloomFilter
        .create(expectedItems, fpp).writeTo(out)
      out.toByteArray
    }
  }

  /** Membership pre-test of `key` against a serialized filter from
    * [[build]]. False positives at the built `fpp`; NO false
    * negatives. Codegen'd scalar expression — usable in any filter or
    * projection. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumn.of(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftColumn.expr(key)))))
}
