package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import graft.sources.Tables

/** Relational query inventory (SURVEY.md §2.2–§2.8).
  *
  * The reference delegates its relational surface to embedded DuckDB SQL
  * (`dags/tutorial_objectstorage.py:118-120`); here each capability is a
  * declarative Spark plan so Catalyst owns pushdown/pruning/join
  * selection, and ships with the equivalent ANSI SQL for the oracle.
  *
  * Determinism rules for oracle parity (both engines):
  *   - money/quantity sums are computed in DECIMAL(18,2) (exact) and cast
  *     to DOUBLE only at the output boundary — a distributed double sum
  *     has partition-order-dependent rounding, a decimal sum does not;
  *   - averages are exact decimal sums divided in double (IEEE division
  *     of identical operands is bitwise deterministic);
  *   - every query ends in a total ORDER BY so row order never depends on
  *     partitioning.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  val defs: Seq[QueryDef] = Seq(

    // ----- A5/A1-class aggregation: TPC-H Q1-style pricing summary -----
    QueryDef(
      "q01_pricing_summary",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ----- P1/P2/P6: filter + projection + cast (pushdown-friendly) -----
    QueryDef(
      "q02_filter_project",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        // No trailing ORDER BY: the driver canonicalizes row order before
        // hashing, so a global sort here would be a pure range-partition
        // exchange at scale for zero semantic value. floor() pins the
        // double→int semantics (Spark truncates, DuckDB rounds — floor on
        // both sides makes the cast data-independent).
        li.filter(col("l_quantity") > 45 && col("l_discount").between(0.02, 0.08))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            floor(col("l_quantity")).cast("int").as("qty_int"),
            upper(col("l_returnflag")).as("flag"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_quantity) AS INT) AS qty_int,
               upper(l_returnflag) AS flag
        FROM lineitem
        WHERE l_quantity > 45 AND l_discount BETWEEN 0.02 AND 0.08""")),

    // ----- J1/O3: 3-way join + group + top-k (TPC-H Q3-style) -----
    QueryDef(
      "q03_top_revenue",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
        val o = Tables.load(spark, dir, "orders")
        val l = Tables.load(spark, dir, "lineitem")
        c.filter(col("c_mktsegment") === "BUILDING")
          .join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_date
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""")),

    // ----- P5/P6/A5: range-predicate scan + single aggregate (Q6-style) -----
    QueryDef(
      "q06_revenue_forecast",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24)
          .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast("double").as("revenue"))
      },
      Some("""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""")),

    // ----- 2.7: set operations -----
    QueryDef(
      "q14_setops",
      (spark, dir) => {
        val c = Tables.load(spark, dir, "customer")
          .select(col("c_nationkey").cast("int").as("nationkey"))
        val s = Tables.load(spark, dir, "supplier")
          .select(col("s_nationkey").cast("int").as("nationkey"))
        val both = c.intersect(s).withColumn("tag", lit("both"))
        val custOnly = c.except(s).withColumn("tag", lit("customer_only"))
        both.unionByName(custOnly).orderBy(col("tag"), col("nationkey"))
      },
      Some("""
        WITH c AS (SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer),
             s AS (SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
        SELECT nationkey, 'both' AS tag FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        UNION ALL
        SELECT nationkey, 'customer_only' AS tag FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
        ORDER BY tag, nationkey""")),

    // ----- F10: JSON extraction from the events stream table -----
    QueryDef(
      "q24_json_extract",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        e.select(
            col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type"""))
  )
}
