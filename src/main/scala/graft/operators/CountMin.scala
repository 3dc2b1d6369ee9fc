package graft.operators

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications"):
  * frequency POINT queries over an unbounded key space through a
  * fixed-size mergeable summary.
  *
  * Complements [[HeavyHitters]]: Misra–Gries answers "which keys are
  * the top-k" (and only for keys it kept); Count-Min answers "how
  * often did THIS key occur" for ANY key, including ad-hoc keys chosen
  * after the scan — the shape behind blocklist-hit telemetry,
  * contamination-probe counting, and per-phrase corpus statistics
  * where the probe set is not known while the corpus streams by.
  *
  * Structure: `depth` hash rows × `width` counters. Each occurrence
  * increments one counter per row; the estimate is the MIN over rows.
  * Guarantees (insert-only stream, so both sides are one-sided):
  *
  *  - **never underestimates** — every counter the key touches holds
  *    its true count plus non-negative collision mass;
  *  - overestimates by more than ε·N (ε = e/width) with probability
  *    < e^−depth per key, over the hash draw.
  *
  * The sketch is entry-wise mergeable with plain addition (the
  * counters are linear in the input), so it runs as a typed
  * [[Aggregator]] partial-aggregate: each task fills a local
  * depth×width table and only the fixed-size tables cross the wire —
  * the exchange is sketch-sized (depth·width·8 bytes, ~64 KiB at
  * 4×2048) at ANY corpus size or key cardinality, against a
  * distinct-key-sized exchange for the exact `groupBy` spelling
  * (measured for the analogous Misra–Gries path in ShuffleProbe).
  *
  * Hashing is seeded deterministically (MurmurHash3, per-row seeds),
  * so estimates are reproducible across runs, partitionings, and merge
  * orders — CountMinSpec pins merge-invariance and the bounds;
  * q148 validates the bracket [exact, exact + ε·N] in-path on real
  * data (the q110 runtime-certificate idiom).
  */
object CountMin {

  /** depth×width counters flattened row-major; `n` = stream length. */
  final case class Sketch(width: Int, depth: Int, n: Long, counts: Array[Long]) {

    /** Point estimate: min over the key's counters. ≥ true count. */
    def estimate(key: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = counts(r * width + bucket(key, r, width))
        if (c < best) best = c
        r += 1
      }
      if (best == Long.MaxValue) 0L else best
    }

    /** The one-sided error budget ε·N with ε = e/width. */
    def errorBound: Double = math.E / width * n
  }

  /** Deterministic per-row bucket: seeded MurmurHash3 of the UTF-16
    * string, floor-mod into the row. Seeds are fixed constants so a
    * sketch built on one cluster answers queries on another. */
  private[graft] def bucket(key: String, row: Int, width: Int): Int =
    Math.floorMod(MurmurHash3.stringHash(key, 0x9747b28c + row * 0x5bd1e995), width)

  /** Mergeable Count-Min [[Aggregator]] over strings. The buffer is a
    * primitive long array (slot 0 = n, then the row-major table) kept
    * in place between rows; kryo serializes it only at
    * partial-aggregate boundaries — the only bytes that cross the
    * wire, fixed-size by construction. */
  final class CountMinAgg(width: Int, depth: Int)
      extends Aggregator[String, Array[Long], Sketch] {
    require(width >= 2 && depth >= 1, s"need width >= 2, depth >= 1; got $width x $depth")

    def zero: Array[Long] = new Array[Long](1 + width * depth)

    def reduce(b: Array[Long], a: String): Array[Long] = {
      b(0) += 1L
      var r = 0
      while (r < depth) {
        b(1 + r * width + bucket(a, r, width)) += 1L
        r += 1
      }
      b
    }

    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

    def finish(b: Array[Long]): Sketch =
      Sketch(width, depth, b(0), java.util.Arrays.copyOfRange(b, 1, b.length))

    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  /** Entry-wise sum of two same-shape sketches — the linearity that
    * makes Count-Min an incremental model with the same merge story
    * as the DSIR count table and the bigram-LM counts: per-batch
    * sketches add into a store and the result is EXACTLY the
    * whole-corpus sketch, no approximation drift to monitor
    * (StreamsSpec pins the foreachBatch form). */
  def merge(a: Sketch, b: Sketch): Sketch = {
    require(a.width == b.width && a.depth == b.depth,
      s"sketch shapes differ: ${a.depth}x${a.width} vs ${b.depth}x${b.width}")
    val out = new Array[Long](a.counts.length)
    var i = 0
    while (i < out.length) { out(i) = a.counts(i) + b.counts(i); i += 1 }
    Sketch(a.width, a.depth, a.n + b.n, out)
  }

  /** Build one [[Sketch]] over the non-NULL values of `itemCol` and
    * collect it (bounded: ONE fixed-size row). */
  def sketch(items: DataFrame, itemCol: String, width: Int, depth: Int): Sketch = {
    val agg = udaf(new CountMinAgg(width, depth), Encoders.STRING)
    items.where(col(itemCol).isNotNull)
      .agg(agg(col(itemCol)).as("s"))
      .select(col("s.width"), col("s.depth"), col("s.n"), col("s.counts"))
      .as(Encoders.product[Sketch]).head()
  }

  /** Exact corpus-wide counts for a bounded probe-key set, VALIDATED
    * in-path against a Count-Min sketch of the same stream — the q110
    * runtime-certificate idiom, pointed at point queries instead of
    * top-k. One pass builds the fixed-size sketch, one probe-filtered
    * pass recounts exactly (the probe broadcasts; after map-side
    * combine the count exchange is probe-sized); the method then
    * asserts, per probe key — INCLUDING keys absent from the corpus,
    * whose exact count is 0 — that the estimate brackets inside
    * [exact, exact + ε·N], throwing loudly on a hash catastrophe
    * instead of letting a silently-degraded sketch into telemetry.
    * Returns the EXACT counts of the keys that occur (inner-join
    * semantics, mirroring the SQL oracle); absent keys are validated
    * but yield no row. The sketch is the validated scale path for
    * keys the exact pass never counted.
    */
  def probeCountsChecked(items: DataFrame, itemCol: String, probe: DataFrame,
      width: Int, depth: Int): DataFrame = {
    require(probe.columns.contains(itemCol),
      s"probe must carry a '$itemCol' column, has ${probe.columns.mkString(",")}")
    val sk = sketch(items, itemCol, width, depth)
    val probeKeys = probe.select(col(itemCol)).distinct()
    val exact = items.where(col(itemCol).isNotNull)
      .join(broadcast(probeKeys), Seq(itemCol))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n"))
    val rows = Barrier.materialize(exact)
    val bound = sk.errorBound
    val exactByKey = rows.collect()
      .map(r => r.getAs[String](itemCol) -> r.getAs[Long]("n")).toMap
    // assert over EVERY probe key, including those absent from the
    // corpus (exact = 0): a zero-count key is exactly where a
    // catastrophically undersized sketch would otherwise go unchecked.
    // The CMS guarantee is PER-KEY probabilistic — P(est > exact + ε·N)
    // ≤ e^(−depth) =: p over the hash draw — and the seeds here are
    // fixed, so a legitimate corpus can deterministically put a few
    // keys of a large probe set past the ε·N bracket (depth=4 ⇒ up to
    // ~1.8% per key). A hash CATASTROPHE is many keys breaching at
    // once; a handful is the contract working as specified.
    //
    // Tolerance derivation (sound under ARBITRARY correlation — the
    // point: every probe key shares the same `depth` hash rows, so
    // breaches are positively correlated and any independence-based
    // band understates the legitimate throw rate). Let B = Σ_k 1[key
    // k breaches]. Linearity of expectation needs no independence:
    // E[B] = Σ_k P(breach_k) ≤ n·p — the per-row union bound summed
    // over the probe set. Markov's inequality, also
    // correlation-free: P(B ≥ t) ≤ E[B]/t ≤ n·p/t. Throwing at
    // B > allowed, i.e. B ≥ allowed+1, therefore has false-throw
    // probability ≤ n·p/(allowed+1); choosing
    // allowed = ⌈n·p/δ⌉ − 1 makes the certificate's stated throw
    // probability δ ACTUAL, not modeled. δ = 1/20 here. Small probe
    // sets stay strict — n = 1, depth = 4 gives allowed = 0, a
    // single-key certificate still throws on its breach (at
    // probability ≤ p ≈ 1.8% < δ) — while a 30-key depth-4 probe
    // tolerates ⌈0.55/0.05⌉−1 = 10 of 30: looser than the old
    // independence-assuming 3σ band (2 of 30), which is the honest
    // price of a bound that survives one overloaded row pushing many
    // keys past the bracket at once. A genuine catastrophe (an
    // undersized or corrupt sketch) breaches essentially every key,
    // far past any fraction this band admits.
    // (Underestimates est < exact remain structurally impossible and
    // always throw.)
    val keys = probeKeys.collect().map(_.getAs[String](itemCol)).filter(_ != null)
    val breaches = keys.flatMap { key =>
      val n = exactByKey.getOrElse(key, 0L)
      val est = sk.estimate(key)
      if (est < n)
        throw new IllegalStateException(
          s"count-min UNDERestimate for '$key': est=$est exact=$n — " +
            "structurally impossible, sketch state is corrupt " +
            s"(width=$width depth=$depth N=${sk.n})")
      if (est > n + bound) Some(s"'$key': est=$est exact=$n") else None
    }
    val p = math.exp(-depth.toDouble)
    val delta = 0.05 // the certificate's stated false-throw probability
    // Clamped to n−1 so the certificate can never go VACUOUS: at
    // depth ≤ 2, p > δ makes the Markov tolerance exceed the probe
    // size (⌈n·p/δ⌉−1 ≥ n), and an uncapped band would let a sketch
    // where EVERY key breaches pass silently. The clamp keeps the
    // all-keys catastrophe arm always fatal; its own false-throw
    // probability is P(B = n) ≤ min_k P(breach_k) ≤ p (all breaching
    // implies any one breaching), so a clamped shallow-depth
    // certificate throws falsely at ≤ e^(−depth) instead of the
    // stated δ — weaker, stated, and infinitely better than a
    // certificate structurally unable to fire.
    val markov = math.max(0L, math.ceil(keys.length * p / delta).toLong - 1)
    val cap = math.max(0L, keys.length - 1L)
    val allowed = math.min(cap, markov)
    // when the clamp binds, δ is NOT the operative bound — the message
    // must state the weaker e^(−depth) the comment above derives, or a
    // legitimate shallow-depth throw (up to ~37% at depth 1) misreads
    // as a 1-in-20 event and misdirects the investigation
    val statedBound = if (markov > cap) p else delta
    // name the bound that actually applied: when the clamp binds,
    // `allowed` is the all-keys cap, not the Markov tolerance — an
    // operator recomputing ceil(n·p/δ)−1 would get a different number
    // and conclude the arithmetic is broken
    val tolLabel = if (markov > cap) s"all-keys cap $allowed (Markov $markov)"
      else s"Markov tolerance $allowed"
    if (breaches.length > allowed)
      throw new IllegalStateException(
        s"count-min estimates out of bracket for ${breaches.length} of " +
          s"${keys.length} probe keys ($tolLabel at " +
          f"depth=$depth, stated false-throw <= $statedBound%.3f): " +
          s"${breaches.take(5).mkString("; ")} " +
          s"bound=+${bound.round} (width=$width N=${sk.n})")
    rows.orderBy(col("n").desc, col(itemCol))
  }
}
