package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import graft.sources.Tables

/** Relational breadth inventory (SURVEY.md §2.3–§2.8 rows not covered by
  * [[Relational]]): window functions, join variety, grouping sets,
  * aggregation breadth, and the date/string/array/map scalar library.
  *
  * The reference exposes these through its embedded-SQL surface
  * (`dags/tutorial_objectstorage.py:118-120`) and its DAGs' scalar
  * helpers (`dags/tutorial.py:112-114` date math,
  * `dags/plugins/workday.py:49` weekday tests,
  * `dags/example_inlet_event_extra.py:45,60` array slicing,
  * `dags/tutorial_dag.py:73-77` map-value iteration). Each row here is a
  * declarative Catalyst plan plus the equivalent ANSI SQL for the DuckDB
  * oracle.
  *
  * Cross-engine determinism notes (also see [[Relational]]):
  *   - money sums go through DECIMAL(18,2) so partition order never
  *     changes the result; double columns are only min/max'd or compared,
  *     never summed;
  *   - day-of-week is pinned to ISO numbering (Mon=1..Sun=7): Spark
  *     `weekday(d)+1` == DuckDB `isodow(d)` — the engines' bare
  *     `dayofweek` disagree on the origin;
  *   - every window ordering is total (keys appended) so rank/lag never
  *     depend on partitioning.
  */
object Analytic {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  val defs: Seq[QueryDef] = Seq(

    // ----- W1: navigation functions over a total per-partition order -----
    QueryDef(
      "q04_window_nav",
      (spark, dir) => {
        val o = Tables.load(spark, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.select(
            col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"))
          .filter(col("rn") <= 3)
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rn, prev_price, next_price
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER w AS rn,
                 lag(o_totalprice, 1) OVER w AS prev_price,
                 lead(o_totalprice, 1) OVER w AS next_price
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ) WHERE rn <= 3""")),

    // ----- W1: rank/dense_rank under genuine ties -----
    QueryDef(
      "q05_window_ties",
      (spark, dir) => {
        val o = Tables.load(spark, dir, "orders")
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderpriority"))
        o.select(
          col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_orderpriority,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderpriority)""")),

    // ----- W1: frames — running total + 3-row moving aggregate -----
    QueryDef(
      "q07_window_frames",
      (spark, dir) => {
        val o = Tables.load(spark, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val mov = w.rowsBetween(-2, Window.currentRow)
        o.select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(run).cast("double").as("running_spend"),
          sum(dec(col("o_totalprice"))).over(mov).cast("double").as("mov3_spend"),
          count(lit(1)).over(mov).as("mov3_n"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3_spend,
               count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov3_n
        FROM orders""")),

    // ----- J1: left outer join preserving customers with no orders -----
    QueryDef(
      "q08_join_left",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        val o = Tables.load(spark, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast("double").as("total_spend"))
      },
      Some("""
        SELECT c_custkey, count(o_orderkey) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey""")),

    // ----- J2: semi + anti join ("has orders" / "new records only") -----
    QueryDef(
      "q09_join_semi_anti",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        val o = Tables.load(spark, dir, "orders")
        val active = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), lit("active").as("tag"))
        val dormant = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), lit("dormant").as("tag"))
        active.unionByName(dormant)
      },
      Some("""
        SELECT c_custkey, 'active' AS tag FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
        UNION ALL
        SELECT c_custkey, 'dormant' AS tag FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""")),

    // ----- J4: theta (non-equi range) join against a literal dim -----
    QueryDef(
      "q10_join_theta",
      (spark, dir) => {
        import spark.implicits._
        val o = Tables.load(spark, dir, "orders")
        // Broadcast-nested-loop against a 3-row literal dim: the Spark
        // plan for non-equi joins with a tiny side. At 100 TB the dim is
        // still 3 rows — the broadcast is the correct strategy.
        val buckets = Seq(
          ("small", 0.0, 1000.0),
          ("medium", 1000.0, 5000.0),
          ("large", 5000.0, 1e12)).toDF("bucket", "lo", "hi")
        o.join(broadcast(buckets),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("o_totalprice"))).cast("double").as("spend"))
      },
      Some("""
        SELECT bucket, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders
        JOIN (VALUES ('small', 0.0, 1000.0), ('medium', 1000.0, 5000.0),
                     ('large', 5000.0, 1e12)) AS b(bucket, lo, hi)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY bucket""")),

    // ----- A5: ROLLUP with sentinel-coalesced subtotal rows -----
    QueryDef(
      "q11_rollup",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("sum_qty"), col("n"))
      },
      Some("""
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),

    // ----- A5: CUBE over two dimensions -----
    QueryDef(
      "q12_cube",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        c.cube(col("c_mktsegment"), col("c_nationkey"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("c_acctbal"))).cast("double").as("bal"))
          .select(
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            coalesce(col("c_nationkey"), lit(-1)).as("nationkey"),
            col("n"), col("bal"))
      },
      Some("""
        SELECT coalesce(c_mktsegment, 'ALL') AS segment,
               coalesce(c_nationkey, -1) AS nationkey,
               count(*) AS n,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        FROM customer
        GROUP BY CUBE(c_mktsegment, c_nationkey)""")),

    // ----- A5: min / max / exact distinct counts / sum(DISTINCT) -----
    QueryDef(
      "q13_agg_breadth",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(
            min(col("l_quantity")).as("min_qty"),
            max(col("l_extendedprice")).as("max_price"),
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            sum_distinct(dec(col("l_quantity"))).cast("double").as("sum_dist_qty"),
            min(col("l_shipdate")).as("first_ship"),
            max(col("l_shipdate")).as("last_ship"))
      },
      Some("""
        SELECT l_returnflag,
               min(l_quantity) AS min_qty,
               max(l_extendedprice) AS max_price,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part,
               CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_dist_qty,
               min(l_shipdate) AS first_ship,
               max(l_shipdate) AS last_ship
        FROM lineitem
        GROUP BY l_returnflag""")),

    // ----- A5: approx_count_distinct (HLL) — sketch output is
    // engine-specific, so no SQL oracle; the driver records a rows-only
    // check and DedupSpec asserts the estimate is within 5% of exact. -----
    QueryDef(
      "q15_agg_approx",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts"))
      },
      None,
      // bench = false: exists to grade HLL error vs exact (DedupSpec 5%
      // contract); the scan+agg cost it would measure is q13's, twice
      bench = false),

    // ----- F3/F4/F5/F7: date arithmetic + formatting + ISO weekday -----
    QueryDef(
      "q16_dates",
      (spark, dir) => {
        val o = Tables.load(spark, dir, "orders")
        val d = col("o_orderdate").cast("date")
        o.select(
            date_add(d, 7).as("ship_by"),
            date_format(d, "yyyyMMdd").as("ymd"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            (weekday(d) + 1).as("iso_dow"),
            (weekday(d) + 1).isin(6, 7).as("is_weekend"),
            year(d).as("yr"), quarter(d).as("qtr"))
          .groupBy(col("ship_by"), col("ymd"), col("month_start"),
            col("iso_dow"), col("is_weekend"), col("yr"), col("qtr"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS ship_by,
               strftime(o_orderdate, '%Y%m%d') AS ymd,
               date_trunc('month', o_orderdate) AS month_start,
               isodow(o_orderdate) AS iso_dow,
               isodow(o_orderdate) IN (6, 7) AS is_weekend,
               year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
               count(*) AS n
        FROM orders
        GROUP BY ALL""")),

    // ----- F1/F13/F14: string library over part -----
    QueryDef(
      "q17_strings",
      (spark, dir) => {
        val p = Tables.load(spark, dir, "part")
        p.filter(col("p_name").like("%gear%") || col("p_type").isin("ECONOMY", "SMALL"))
          .select(
            col("p_partkey"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            substring(col("p_type"), 1, 4).as("type4"),
            length(col("p_name")).as("name_len"),
            lower(col("p_type")).as("type_lc"),
            regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
            lpad(col("p_brand"), 12, "*").as("brand_pad"),
            element_at(split(col("p_name"), " "), -1).as("last_word"))
      },
      Some("""
        SELECT p_partkey,
               concat_ws('|', p_brand, p_type) AS brand_type,
               substring(p_type, 1, 4) AS type4,
               length(p_name) AS name_len,
               lower(p_type) AS type_lc,
               regexp_extract(p_name, '^(\w+)', 1) AS first_word,
               lpad(p_brand, 12, '*') AS brand_pad,
               string_split(p_name, ' ')[-1] AS last_word
        FROM part
        WHERE p_name LIKE '%gear%' OR p_type IN ('ECONOMY', 'SMALL')""")),

    // ----- F11/O1: array slice / element_at / sort / distinct -----
    QueryDef(
      "q18_arrays",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        val toks = split(col("text"), " ")
        docs.filter(col("doc_id") < 100)
          .select(
            col("doc_id"),
            size(toks).as("n_toks"),
            concat_ws("-", slice(toks, 1, 3)).as("first3"),
            element_at(toks, -1).as("last_tok"),
            element_at(array_sort(array_distinct(toks)), 1).as("min_tok"),
            size(array_distinct(toks)).as("n_uniq"))
      },
      Some("""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_toks,
               array_to_string(string_split(text, ' ')[1:3], '-') AS first3,
               string_split(text, ' ')[-1] AS last_tok,
               list_sort(list_distinct(string_split(text, ' ')))[1] AS min_tok,
               len(list_distinct(string_split(text, ' '))) AS n_uniq
        FROM documents
        WHERE doc_id < 100""")),

    // ----- F10/F12/P3: JSON → map explode → re-aggregate -----
    QueryDef(
      "q19_maps",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val m = from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
        e.select(col("event_type"), explode(m).as(Seq("k", "v")))
          .filter(col("k").isNotNull)
          .groupBy(col("event_type"), col("k"))
          .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
      },
      Some("""
        SELECT event_type, k, CAST(sum(v) AS BIGINT) AS sum_v, count(*) AS n
        FROM (
          SELECT event_type,
                 unnest(json_keys(props)) AS k,
                 CAST(json_extract_string(props, '$.' || unnest(json_keys(props))) AS BIGINT) AS v
          FROM events)
        WHERE k IS NOT NULL
        GROUP BY event_type, k""")),

    // ----- S11/F2/S7: templated SQL-file load over the session catalog -----
    QueryDef(
      "q20_sql_template",
      (spark, dir) => {
        Tables.registerAll(spark, dir)
        val template = graft.sources.SqlTemplates.load("top_nations.sql")
        spark.sql(graft.sources.SqlTemplates.render(template,
          Map("min_acctbal" -> "0")))
      },
      Some("""
        SELECT n_name, r_name, count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_acctbal > 0
        GROUP BY n_name, r_name"""))
  )
}
