package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** The reference's own literal fixtures and time-axis semantics
  * (FIXTURES.md; SURVEY.md §2.4 A1/A4, §2.9 T1).
  */
object Golden {

  /** The reference's literal order payload
    * (`dags/tutorial_dag.py:62`): map order_id → amount whose values
    * must sum to 1236.70 (`dags/tutorial_dag.py:73-77`). */
  val OrderDataJson = """{"1001": 301.27, "1002": 433.21, "1003": 502.22}"""

  val defs: Seq[QueryDef] = Seq(

    // ----- S1/F10/F12/A1: literal JSON → map explode → total -----
    // The reference's flagship computation: extract the hardcoded order
    // JSON, iterate the map values, sum to total_order_value
    // (dags/tutorial_dag.py:60-89). Decimal sum keeps 301.27+433.21+502.22
    // exact; the oracle must see 1236.70.
    QueryDef(
      "q22_golden_orders",
      (spark, _) => {
        val raw = spark.range(1).select(lit(OrderDataJson).as("payload"))
        raw.select(explode(from_json(col("payload"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,decimal(18,2)>")))
            .as(Seq("order_id", "amount")))
          .agg(sum(col("amount")).cast("double").as("total_order_value"))
      },
      Some(s"""
        SELECT CAST(sum(CAST(json_extract_string('$OrderDataJson', '$$.' || k) AS DECIMAL(18,2))) AS DOUBLE) AS total_order_value
        FROM (SELECT unnest(json_keys('$OrderDataJson')) AS k)"""),
      // bench = false: golden one-rower over a literal JSON payload —
      // constant in data size, nothing to measure
      bench = false),

    // ----- A4/F6/F7: hourly re-aggregation of the events stream -----
    // Mirrors the reference's hourly air-quality averages
    // (dags/tutorial_objectstorage.py:32-43). min/max(ts) in the output
    // prove the nanos→micros conversion in Tables.load is exact: the
    // oracle's CAST(TIMESTAMP_NS AS TIMESTAMP) truncates identically, so
    // any double-rounding bug (round-1 verdict #1) would hash-mismatch.
    // Doubles are min/max'd, never summed — order-independent and exact.
    QueryDef(
      "q23_events_hourly",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        e.groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(
            count(lit(1)).as("n"),
            min(col("ts")).as("first_ts"),
            max(col("ts")).as("last_ts"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"),
            sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
            sum((minute(col("ts")) % 2 === 0).cast("long")).as("n_even_minute"))
      },
      Some("""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               count(*) AS n,
               CAST(min(ts) AS TIMESTAMP) AS first_ts,
               CAST(max(ts) AS TIMESTAMP) AS last_ts,
               min(value) AS min_value,
               max(value) AS max_value,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(sum(CASE WHEN minute(ts) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even_minute
        FROM events
        GROUP BY 1""")),

    // ----- T1/T13: interval-scoped incremental extract -----
    // The reference's per-run half-open time slice
    // (dags/tutorial_objectstorage.py:75-88): every run processes
    // [data_interval_start, logical_date). Expressed through
    // graft.streaming.Incremental so the same code path serves
    // checkpointed catch-up runs; the predicate reaches the parquet scan
    // (PushedFilters) so only the slice's row groups are read at scale.
    QueryDef(
      "q25_interval_extract",
      (spark, dir) => {
        val slice = graft.streaming.Incremental.intervalScoped(
          Tables.load(spark, dir, "events"), "ts",
          java.time.Instant.parse("2024-01-10T00:00:00Z"),
          java.time.Instant.parse("2024-01-13T00:00:00Z"))
        slice.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      },
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          AND ts <  TIMESTAMP '2024-01-13 00:00:00'
        GROUP BY event_type"""))
  )
}
