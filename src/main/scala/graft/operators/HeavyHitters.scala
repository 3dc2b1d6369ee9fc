package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact top-k heavy hitters without shuffling the distinct-key table.
  *
  * The reference's top-n-gram report (q89's semantics) spells the exact
  * form: `groupBy(key).count.orderBy.limit(k)`. That plan shuffles one
  * partial-aggregate row PER DISTINCT KEY — fine while the key space is
  * small, but an n-gram space at 100 TB has billions of distinct keys
  * and the exchange becomes the job. This operator is the scale path:
  *
  *  1. **Summary pass** — a mergeable Misra–Gries sketch (Misra & Gries
  *     1982; mergeability per Agarwal, Cormode, Huang, Phillips, Wei &
  *     Yi 2012, "Mergeable Summaries") runs as a typed [[Aggregator]]
  *     partial-aggregate: each task keeps ≤ 2m counters, and only the
  *     ≤ 2m-entry summaries cross the wire (KB-scale exchange,
  *     independent of the key space).
  *  2. **Recount pass** — the ≤ 2m surviving candidate keys broadcast
  *     back and are recounted EXACTLY in one filtered scan; the final
  *     top-k orders candidate-count rows only.
  *
  * The sketch guarantees every key with true count > N/(m+1) survives
  * pass 1 (underestimates only, error ≤ N/(m+1) across any merge tree —
  * each compaction subtracts its threshold t from at least m+1 counters,
  * so Σt ≤ N/(m+1)). Pass 2's exact counts then yield a runtime
  * **exactness certificate**: if the k-th recounted candidate count is
  * strictly greater than N/(m+1), no non-candidate can belong to the
  * true top-k, so the result equals the exact spelling — which is why
  * q110 can share q89's DuckDB oracle verbatim. [[certificate]] exposes
  * the check; HeavyHittersSpec pins the bound and the equality.
  *
  * Scale shape: two scans of the item stream, zero key-space-sized
  * exchanges, ≤ 2m driver/broadcast rows. Size m so that k-th-count >
  * N/(m+1) for the target corpus (a 64k-counter summary is ~MBs).
  */
object HeavyHitters {

  /** Pass-1 output: parallel arrays (a struct column), not a map, so the
    * query side can explode keys with public functions only. */
  final case class Summary(keys: Array[String], counts: Array[Long])

  /** Mergeable Misra–Gries over strings. Buffer is an in-place mutable
    * map (ScalaAggregator keeps it as an object between rows; kryo
    * serializes it only at partial-aggregate boundaries). */
  final class MisraGries(m: Int) extends Aggregator[String, mutable.HashMap[String, Long], Summary] {
    require(m >= 1, s"summary capacity must be >= 1, got $m")

    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def reduce(b: mutable.HashMap[String, Long], a: String): mutable.HashMap[String, Long] = {
      b.update(a, b.getOrElse(a, 0L) + 1L)
      if (b.size > 2 * m) compact(b)
      b
    }

    def merge(x: mutable.HashMap[String, Long], y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      // Fold the smaller side into the larger — merge cost tracks the
      // smaller summary, and the bound is symmetric.
      val (into, from) = if (x.size >= y.size) (x, y) else (y, x)
      from.foreach { case (k, v) => into.update(k, into.getOrElse(k, 0L) + v) }
      if (into.size > 2 * m) compact(into)
      into
    }

    def finish(r: mutable.HashMap[String, Long]): Summary = {
      val arr = r.toArray
      Summary(arr.map(_._1), arr.map(_._2))
    }

    /** Subtract the (m+1)-th largest count t from every counter and drop
      * the non-positive ones: ≤ m survive (only the top-m can exceed t),
      * and the top m+1 counters each lose ≥ t, charging t against N/(m+1)
      * of stream mass — the Misra–Gries error argument, batched. */
    private def compact(b: mutable.HashMap[String, Long]): Unit = {
      val vs = b.values.toArray
      java.util.Arrays.sort(vs)
      val t = vs(vs.length - 1 - m) // (m+1)-th largest; >= 1 (all counts >= 1)
      for ((k, v) <- b.toArray) {
        val nv = v - t
        if (nv <= 0L) b.remove(k) else b.update(k, nv)
      }
    }

    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    def outputEncoder: Encoder[Summary] = Encoders.product[Summary]
  }

  /** The candidate keys surviving the summary pass (≤ 2m rows). NULL
    * keys are excluded up front — the exact `groupBy` spelling counts a
    * NULL group, but an equi-join can never recount one; excluding it
    * HERE (instead of silently losing it in [[topKExact]]'s join) keeps
    * the operator's contract explicit: pre-fill NULLs if they are a
    * meaningful key. */
  def candidates(items: DataFrame, itemCol: String, m: Int): DataFrame = {
    val mg = udaf(new MisraGries(m), Encoders.STRING)
    items
      .where(col(itemCol).isNotNull)
      .agg(mg(col(itemCol)).as("s"))
      .select(explode(col("s.keys")).as(itemCol))
  }

  /** Exact top-k of `itemCol` by occurrence count: summary pass →
    * broadcast candidates → exact recount → order candidates only.
    * Columns: (itemCol, n) with the (count desc, key asc) tie-break —
    * q89's exact contract over non-NULL keys (see [[candidates]]).
    * Exact whenever [[certificate]] holds; size m accordingly for the
    * corpus. */
  def topKExact(items: DataFrame, itemCol: String, k: Int, m: Int): DataFrame = {
    // the count column is fixed as "n" (q89's contract); a key column
    // with the same name would produce duplicate output columns and
    // break itemCol recovery in [[certificate]] — refuse loudly
    require(itemCol != "n", "key column must not be named \"n\" (the count column)")
    items
      .join(broadcast(candidates(items, itemCol, m)), Seq(itemCol))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(itemCol))
      .limit(k)
  }

  /** Self-certifying top-k: run [[topKExact]], check the
    * [[certificate]], and if the result is not PROVEN exact, double m
    * and rerun — so the caller never has to guess the summary size
    * against an unknown key distribution (the testdata-vintage hazard:
    * a regenerated corpus whose tail flattens the k-th count under
    * N/(m+1) silently de-certifies a fixed m). Each attempt costs two
    * item-stream scans plus the 1-row certificate count; the summary
    * stays KB–MB-scale through every doubling, so escalation is cheap
    * — 2m counters at the final m, never key-space-sized. Throws if
    * `maxDoublings` escalations still cannot prove exactness (a
    * genuinely flat distribution — use the exact spelling or accept
    * approximate results explicitly at that point). */
  def topKCertified(items: DataFrame, itemCol: String, k: Int, m: Int,
      maxDoublings: Int = 6): DataFrame = {
    var cur = m
    var attempt = 0
    while (attempt <= maxDoublings) {
      // 50-row barrier: the certificate and the returned frame must see
      // the SAME materialized result (topKExact re-executed could pick
      // different candidates on a nondeterministically-ordered stream)
      val topk = Barrier.materialize(topKExact(items, itemCol, k, cur))
      val cert = certificate(items, topk, k, cur).collect()(0)
      if (cert.getAs[Boolean]("proven"))
        return topk.orderBy(col("n").desc, col(itemCol))
      cur *= 2
      attempt += 1
    }
    throw new IllegalStateException(
      s"top-$k not provably exact after $maxDoublings doublings from m=$m " +
        s"(final m=${cur}): distribution too flat for a summary-sized certificate")
  }

  /** One-row exactness certificate for a [[topKExact]] result computed
    * with the same (k, m): `proven` is true iff the result provably
    * equals the exact `groupBy` spelling (over non-NULL keys). Two
    * sufficient conditions, either closes the gap:
    *
    *  - the result has a FULL k rows and the k-th count strictly
    *    exceeds the evasion bound N/(m+1) — no non-candidate can reach
    *    the cut; or
    *  - the evasion bound is < 1 — NO key can evade the summary at
    *    all, so the candidate set (hence any result it yields, even one
    *    with fewer than k rows) is complete.
    *
    * A result with fewer than k rows whose bound is ≥ 1 is NOT proven:
    * compaction ties can drain the summary below k candidates while
    * evaded keys still exist, and min-over-fewer-rows would compare the
    * wrong count against the bound. */
  def certificate(items: DataFrame, topk: DataFrame, k: Int, m: Int): DataFrame = {
    val kth = topk.agg(min(col("n")).as("kth_count"), count(lit(1)).as("k_found"))
    items.where(col(itemCol(topk)).isNotNull)
      .agg(count(lit(1)).as("n_total")).crossJoin(kth)
      .select(col("n_total"), col("kth_count"), col("k_found"),
        (col("n_total").cast("double") / (m + 1.0)).as("evasion_bound"),
        ((col("k_found") === k &&
          col("kth_count") > col("n_total").cast("double") / (m + 1.0)) ||
         col("n_total").cast("double") / (m + 1.0) < 1.0).as("proven"))
  }

  /** The key column of a [[topKExact]] result: its non-`n` column. */
  private def itemCol(topk: DataFrame): String =
    topk.columns.filter(_ != "n").head
}
