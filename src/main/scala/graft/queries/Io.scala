package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import graft.sources.{Sinks, Tables}

/** Write-path queries (SURVEY.md §2.1 S4/S6/S7): the reference's
  * write-then-SQL loop — date-partitioned parquet out, CTAS over it,
  * query the catalog table (`dags/tutorial_objectstorage.py:94-120`,
  * `dags/sql/sample.sql:20-24`) — proven by a full round-trip whose
  * result the oracle checks against the source table directly.
  */
object Io {

  val defs: Seq[QueryDef] = Seq(

    // ----- S4+S6+S7: partitioned write → read back → CTAS → SQL -----
    QueryDef(
      "q21_write_roundtrip",
      (spark, dir) => {
        // fixed scratch path + overwrite mode: repeated invocations
        // (verify × warmup × bench runs) reuse it instead of leaking a
        // fresh temp directory each time
        val tmp = scratchPath("roundtrip")
        val o = Tables.load(spark, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate")))
        // S4: date-partitioned parquet sink — downstream year predicates
        // prune whole directories (static partition pruning).
        Sinks.parquetPartitioned(o, s"$tmp/orders_part", "o_year")
        // S5: read the partitioned layout back; S7 DDL is exercised by
        // the view + CTAS path below.
        spark.read.parquet(s"$tmp/orders_part")
          .createOrReplaceTempView("orders_roundtrip")
        // S6: CTAS into the session catalog, then query the table.
        Sinks.ctas(spark, "orders_by_year",
          """SELECT o_year, o_orderpriority,
                    count(*) AS n,
                    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             FROM orders_roundtrip
             GROUP BY o_year, o_orderpriority""")
        spark.table("orders_by_year")
          .filter(col("o_year") >= 1995)
      },
      Some("""
        SELECT year(o_orderdate) AS o_year, o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE year(o_orderdate) >= 1995
        GROUP BY o_year, o_orderpriority"""),
      // bench = false: measures tmpdir disk write + catalog DDL, not
      // query throughput — sink cost at scale is storage-bound, and the
      // agg it ends with is q01's shape
      bench = false)
  )
}
