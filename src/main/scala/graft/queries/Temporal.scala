package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.{AsOf, Ranges}
import graft.sources.Tables

/** As-of join (J5), binned range join (J4 at scale), and the remaining
  * predicate rows (P3/P4, P6's LIKE/IN/IS NULL combos). */
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
          ON c.user_id = p.user_id AND c.ts >= p.ts""")),

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
        GROUP BY event_type""")),

    // ----- J1 completion: right + full outer equi-joins -----
    // supplier⟗nation on a key subset so both sides have non-matching
    // rows: suppliers keep nulls for missing nations (full), and the
    // right join is the mirror of q08's left.
    QueryDef(
      "q43_join_outer",
      (spark, dir) => {
        val s = Tables.load(spark, dir, "supplier")
          .filter(col("s_suppkey") % 3 =!= 0)
          .select(col("s_suppkey"), col("s_nationkey"))
        val n = Tables.load(spark, dir, "nation")
          .filter(col("n_nationkey") < 15)
          .select(col("n_nationkey"), col("n_name"))
        val full = s.join(n, col("s_nationkey") === col("n_nationkey"), "full")
          .select(lit("full").as("kind"), col("s_suppkey"), col("n_name"))
        val right = s.join(n, col("s_nationkey") === col("n_nationkey"), "right")
          .select(lit("right").as("kind"), col("s_suppkey"), col("n_name"))
        full.unionByName(right)
      },
      Some("""
        WITH s AS (SELECT s_suppkey, s_nationkey FROM supplier WHERE s_suppkey % 3 <> 0),
             n AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 15)
        SELECT 'full' AS kind, s_suppkey, n_name
        FROM s FULL OUTER JOIN n ON s_nationkey = n_nationkey
        UNION ALL
        SELECT 'right' AS kind, s_suppkey, n_name
        FROM s RIGHT JOIN n ON s_nationkey = n_nationkey""")),

    // ----- F9/F13/F14: clamp, map_keys, math/regexp scalar breadth -----
    QueryDef(
      "q44_scalar_breadth",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val m = from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
        e.filter(col("event_id") < 2000)
          .select(
            col("event_id"),
            greatest(lit(1.0), least(col("value"), lit(100.0))).as("clamped"),
            concat_ws(",", array_sort(map_keys(m))).as("prop_keys"),
            round(sqrt(abs(col("value"))), 6).as("root"),
            round(exp(col("value") / 1000.0), 6).as("ex"),
            round(log(col("value") + 1000.0), 6).as("ln"),
            pow(lit(2.0), floor(col("value") / 100.0)).as("p2"),
            abs(col("value")).as("mag"),
            regexp_replace(col("event_type"), "[aeiou]", "_").as("devoweled"),
            (col("user_id") % 7).as("mod7"))
      },
      Some("""
        SELECT event_id,
               greatest(1.0, least(value, 100.0)) AS clamped,
               array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
               round(sqrt(abs(value)), 6) AS root,
               round(exp(value / 1000.0), 6) AS ex,
               round(ln(value + 1000.0), 6) AS ln,
               pow(2.0, floor(value / 100.0)) AS p2,
               abs(value) AS mag,
               regexp_replace(event_type, '[aeiou]', '_', 'g') AS devoweled,
               user_id % 7 AS mod7
        FROM events
        WHERE event_id < 2000""")),

    // ----- J4 at scale: binned range join (events × daily windows) -----
    // Count events inside each day's [06:00, 18:00) window. The Spark
    // side goes through Ranges.binnedRangeJoin (bin equi-join + exact
    // filter — no nested loop); the oracle is the plain inequality
    // join, so the hash-match proves the binning rewrite is lossless.
    // Epochs are exact integer seconds on both sides (micros div 1e6).
    QueryDef(
      "q61_range_join",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val pts = e.select(col("event_id"), col("ts").cast("long").as("pt"))
        val bounds = e.agg(min(to_date(col("ts"))).as("lo_d"),
          max(to_date(col("ts"))).as("hi_d"))
        val windows = bounds
          .select(explode(sequence(col("lo_d"), col("hi_d"),
            expr("interval 1 day"))).as("d"))
          .select(col("d"),
            (col("d").cast("timestamp").cast("long") + 6 * 3600).as("lo"),
            (col("d").cast("timestamp").cast("long") + 18 * 3600).as("hi"))
        Ranges.binnedRangeJoin(pts, "pt", windows, "lo", "hi", binWidth = 21600L)
          .groupBy(col("d"))
          .agg(count(lit(1)).as("n"),
            min(col("pt")).as("first_pt"), max(col("pt")).as("last_pt"))
      },
      Some("""
        WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo_d, max(CAST(ts AS DATE)) AS hi_d
                   FROM events),
        days AS (SELECT CAST(unnest(generate_series(lo_d, hi_d, INTERVAL 1 DAY)) AS DATE) AS d
                 FROM b),
        w AS (SELECT d,
                     epoch_us(CAST(d AS TIMESTAMP)) // 1000000 + 21600 AS lo,
                     epoch_us(CAST(d AS TIMESTAMP)) // 1000000 + 64800 AS hi
              FROM days),
        p AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS pt
              FROM events)
        SELECT d, count(*) AS n, min(pt) AS first_pt, max(pt) AS last_pt
        FROM p JOIN w ON pt >= lo AND pt < hi
        GROUP BY d""")),

    // ----- Batch sessionization: 30-min-gap sessions per user -----
    // The classic clickstream shape: a new session starts when the gap
    // to the previous event exceeds 30 minutes; session_id is the
    // running count of session starts. One shuffle on user_id serves
    // both windows AND the final per-session aggregate (same key
    // prefix, no re-exchange). Doubles are aggregated min/max only
    // (order-independent — see q23's precedent); ties on ts are broken
    // by event_id so the lag/sum windows are deterministic. The
    // streaming sibling of this operator is session_window /
    // flatMapGroupsWithState (StreamsSpec); this is the backfill form.
    QueryDef(
      "q70_sessionize",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val prev = lag(col("ts"), 1).over(w)
        val sess = e.select(col("user_id"), col("event_id"), col("ts"))
          .withColumn("new_sess",
            when(prev.isNull ||
              col("ts") > prev + expr("interval 30 minutes"), 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_sess"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        sess.groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("sess_start"),
            max(col("ts")).as("sess_end"))
      },
      Some("""
        WITH o AS (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events
        ), f AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM o
        ), s AS (
          SELECT user_id, ts,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM f
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events,
               CAST(min(ts) AS TIMESTAMP) AS sess_start,
               CAST(max(ts) AS TIMESTAMP) AS sess_end
        FROM s GROUP BY user_id, session_id""")),

    // ----- Retention cohorts: weekly cohort × week-offset matrix -----
    // The product-analytics staple over the events table: users
    // cohorted by first-active week (Monday-truncated, identical
    // semantics on both engines), retention = share of the cohort
    // active again at each week offset. Scale shape: the distinct
    // (user, week) projection partial-aggregates map-side; the cohort
    // join is user-keyed; the final matrix is tiny (weeks²), so its
    // cohort-size window runs over aggregated rows only — the corpus
    // never passes through a window. Week offsets divide exactly by 7
    // (both sides are week-truncated), so the int cast is lossless.
    QueryDef(
      "q97_retention_cohorts",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val weekly = e.select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk")).distinct()
        val cohort = weekly.groupBy(col("user_id"))
          .agg(min(col("wk")).as("cohort_wk"))
        val act = weekly.join(cohort, "user_id")
          .select(col("cohort_wk"),
            (datediff(col("wk"), col("cohort_wk")) / 7).cast("int").as("week_offset"))
          .groupBy(col("cohort_wk"), col("week_offset"))
          .agg(count(lit(1)).as("n_users"))
        val w = Window.partitionBy(col("cohort_wk"))
        act.withColumn("retention",
          round(col("n_users").cast("double")
            / max(when(col("week_offset") === 0, col("n_users"))).over(w), 6))
      },
      Some("""
        WITH weekly AS (
          SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk FROM events
        ), cohort AS (
          SELECT user_id, min(wk) AS cohort_wk FROM weekly GROUP BY 1
        ), act AS (
          SELECT cohort_wk,
                 CAST(date_diff('day', cohort_wk, wk) / 7 AS INT) AS week_offset,
                 CAST(count(*) AS BIGINT) AS n_users
          FROM weekly JOIN cohort USING (user_id)
          GROUP BY 1, 2
        )
        SELECT cohort_wk, week_offset, n_users,
               round(n_users::DOUBLE
                     / max(CASE WHEN week_offset = 0 THEN n_users END)
                       OVER (PARTITION BY cohort_wk), 6) AS retention
        FROM act"""))
  )
}
