package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins at 100 TB (SURVEY.md §4; builder brief
  * "salting for skew").
  *
  * AQE's skew-join splitting handles moderate skew at runtime; salting
  * is the static fallback for pathological hot keys (one key holding a
  * double-digit percentage of the fact table), where even a split
  * partition re-concentrates on the same reducer in later stages.
  *
  * Salted equi-join: the skewed (large) side gets a uniform random-ish
  * salt in [0, buckets); the small side is replicated `buckets` times
  * with every salt value; the join key becomes (key, salt). The hot
  * key's rows now spread over `buckets` reducers. Replication cost is
  * |small side| × buckets — use only when the small side is modest and
  * the skew is real.
  *
  * The salt is derived from stable row content (xxhash64 of the
  * skewed side's whole row % buckets), not rand(): deterministic under
  * retries/speculation, which nondeterministic salting is not (a
  * re-executed task must land rows in the same bucket).
  */
object Skew {

  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // replica semantics only hold when unmatched REPLICATED rows never
    // surface: a right/full outer join would emit every unmatched
    // small-side row once PER SALT REPLICA (buckets× duplication)
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/semi/anti, not '$joinType': " +
        "unmatched replicated small-side rows would surface once per salt")
    // LIMITATION (documented): the salt is a hash of the whole row, so
    // byte-identical duplicate rows of a hot key share one salt and
    // re-concentrate; deterministic per-row distinguishers (an id or
    // position column) are what actually spread such data.
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(buckets)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("bigint"))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
