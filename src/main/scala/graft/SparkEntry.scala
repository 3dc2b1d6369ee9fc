package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytic, Corpus, Golden, Io, Prep, Rank, Relational, Statistical, Temporal, Udx}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All capabilities are declared as [[QueryDef]]s in `graft.queries.*`;
  * this object just flattens them into the driver's expected shape.
  */
object SparkEntry {

  def all: Seq[QueryDef] =
    Relational.defs ++ Analytic.defs ++ Statistical.defs ++ Golden.defs ++
      Corpus.defs ++ Prep.defs ++ Prep.defs2 ++ Io.defs ++ Udx.defs ++
      Temporal.defs ++ Rank.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own headline semantics: interval-bounded extract +
    * cast + aggregate (dags/tutorial_objectstorage.py:78-120 +
    * dags/tutorial_dag.py:73-77 re-expressed over the test star schema).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin.trim)).toMap
}
