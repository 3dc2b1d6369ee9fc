package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.AsOf
import graft.sources.Tables

/** As-of join (J5) and the remaining predicate rows (P3/P4, P6's
  * LIKE/IN/IS NULL combos). */
object Temporal {

  val defs: Seq[QueryDef] = Seq(

    // ----- J5: as-of join — last purchase value at/before each click -----
    QueryDef(
      "q41_asof_join",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"))
        AsOf.join(clicks, purchases, "user_id", "ts", "value")
      },
      Some("""
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), purchases AS (
          SELECT user_id, ts, max(value) AS value
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id, ts
        )
        SELECT c.event_id, c.user_id, c.ts, p.value AS asof_value
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts"""),
      bench = false),

    // ----- P3/P4/P6: key-presence, equality guard, LIKE/IN/IS NULL -----
    QueryDef(
      "q42_predicates",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val m = from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
        e.filter(
            map_contains_key(m, "k") &&                    // P3 key presence
            col("event_type").isin("click", "view") &&     // P6 IN
            col("props").like("%k%") &&                    // P6 LIKE
            col("value").isNotNull)                        // P6 IS NULL combo
          .select(col("event_type"), col("user_id"),
            element_at(m, "k").as("k"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            // P4: value-equality guard as data — how many rows violate
            // an expected invariant (k must be non-negative).
            sum(when(col("k") < 0, 1L).otherwise(0L)).as("n_violations"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               count(DISTINCT user_id) AS n_users
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
          AND event_type IN ('click', 'view')
          AND props LIKE '%k%'
          AND value IS NOT NULL
        GROUP BY event_type"""))
  )
}
