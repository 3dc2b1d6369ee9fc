package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named query over the test tables
  * plus (when SQL-expressible) the equivalent ANSI SQL for the DuckDB
  * oracle. Column names of the Spark result and the oracle SQL must
  * match exactly — the driver's compare sorts columns by name before
  * hashing values.
  *
  * @param bench whether the query participates in the headline BENCH run
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)
