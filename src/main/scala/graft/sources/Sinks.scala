package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-path connectors (SURVEY.md §2.1 S4/S6/S7/S9/S10).
  *
  * The reference's core loop is WRITE parquet to object storage, then
  * SQL over it: `df.to_parquet("s3://…/air_quality_YYYYMMDD.parquet")`
  * then `CREATE OR REPLACE TABLE … AS SELECT * FROM read_parquet(…)`
  * (`dags/tutorial_objectstorage.py:94-101,116-120`). Here the same
  * shapes target any Hadoop-FS URI (local file://, hdfs://, s3a:// on a
  * real cluster — the API surface is identical, only the URI changes).
  */
object Sinks {

  private val IdentPart = "[A-Za-z_][A-Za-z0-9_]*"
  private val Qualified = s"$IdentPart(\\.$IdentPart)?".r

  /** Validate a table name (`tbl` or `db.tbl`, word chars only — it is
    * interpolated into DDL) and split into (database, table), filling
    * the current database for unqualified names. */
  private def parseIdent(spark: SparkSession, table: String): (String, String) = {
    require(Qualified.matches(table),
      s"invalid table identifier (expected tbl or db.tbl of [A-Za-z0-9_]): $table")
    table.split('.') match {
      case Array(db, t) => (db, t)
      case Array(t)     => (spark.catalog.currentDatabase, t)
    }
  }

  /** Managed-table data path: <database location>/<table> — resolved
    * through the catalog (`db.db` dirs, custom db locations), never by
    * string-gluing onto the warehouse root. */
  private def managedPath(spark: SparkSession, db: String, tbl: String) =
    new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(new java.net.URI(
        spark.catalog.getDatabase(db).locationUri)), tbl.toLowerCase)

  /** Drop `db`.`tbl` AND clear its managed location: the session
    * catalog is in-memory but the warehouse dir is durable, so a table
    * written by a previous JVM leaves an orphaned location that DROP
    * alone (no catalog entry) won't clear; replace semantics require
    * clearing it. */
  private def dropWithLocation(spark: SparkSession, db: String, tbl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$tbl`")
    val loc = managedPath(spark, db, tbl)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    ()
  }

  /** Whether `path` holds any DATA files — the index-append bootstrap
    * guard's "is this layout populated?" probe. Data = any
    * non-hidden file outside hidden directories: exactly what a
    * parquet reader of the layout would see. A name allowlist
    * (`part-*`) is NOT enough — batch-transactional appends publish
    * files under a `b<id>-part-*` prefix ([[graft.operators.Layout
    * .idempotentAppend]]), and a probe that missed them would report
    * a populated layout as empty, letting a mismatched config replace
    * the marker over live rows. Hidden-prefixed entries (`_graft_*`
    * markers/ledger/staging, `_SUCCESS`, `.crc`) don't count: they
    * are metadata about a layout, not rows a mismatched config could
    * corrupt — and the walk skips hidden DIRECTORIES entirely, so
    * in-flight staged files (invisible to readers) don't count
    * either. Driver-side listing, short-circuits on the first hit —
    * called once per append, on layouts whose directory count is
    * bounded by design (term buckets / cluster ids). */
  def hasDataFiles(spark: SparkSession, path: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the publisher's predicate, shared on purpose: "not data" here
    // must mean exactly what Layout's publish/sweep walks skip
    def hidden(name: String) = graft.operators.Layout.isHidden(name)
    def walk(dir: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(dir).exists { st =>
        val name = st.getPath.getName
        if (st.isDirectory) !hidden(name) && walk(st.getPath)
        else !hidden(name)
      }
    fs.exists(root) && walk(root)
  }

  /** S4: partitioned parquet sink. Date-partitioned layouts
    * (`partitionBy("dt")`) are the scale-critical choice: downstream
    * interval queries prune whole directories instead of row-group
    * filtering (static partition pruning, zero I/O for other days). */
  def parquetPartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    parquetPartitionedMode(df, path, "overwrite", partitionCols: _*)

  /** [[parquetPartitioned]] with an explicit save mode — "append" is
    * the incremental-index shape ([[graft.operators.Postings
    * .appendIndex]]): new batches land in the same partition
    * directories, pure union. One definition serves every partitioned
    * parquet sink in the repo. */
  def parquetPartitionedMode(df: DataFrame, path: String, mode: String,
      partitionCols: String*): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed catalog table: co-locate rows by `keys` into a fixed
    * number of buckets, pre-sorted within each bucket. Two tables
    * bucketed the same way join WITHOUT a shuffle — the scan's bucket
    * layout satisfies the join's required distribution, so the
    * exchange disappears (and with `sortBy`, so does the sort). This
    * is the 100 TB answer for fact-fact joins repeated across runs:
    * pay the shuffle once at write time, never again at read time.
    * BucketingSpec asserts the exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    val (db, tbl) = parseIdent(spark, table)
    dropWithLocation(spark, db, tbl)
    df.write.format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(s"`$db`.`$tbl`")
  }

  /** S6: CTAS over the session catalog. "CREATE OR REPLACE" semantics
    * spelled as drop+create (the session catalog's v1 path doesn't
    * support REPLACE TABLE; the observable behavior is identical). */
  def ctas(spark: SparkSession, table: String, selectSql: String): Unit = {
    val (db, tbl) = parseIdent(spark, table)
    dropWithLocation(spark, db, tbl)
    spark.sql(s"CREATE TABLE `$db`.`$tbl` USING parquet AS $selectSql")
    ()
  }

  /** S7: DDL table creation (the reference's `sample.sql` Orders DDL —
    * `dags/sql/sample.sql:20-24`). PRIMARY KEY is metadata-only in
    * Spark (not enforced), matching the survey's note. */
  def createTable(spark: SparkSession, ddl: String): Unit = { spark.sql(ddl); () }

  /** S9: console/log sink (`print(total_order_value)` /
    * `df2.head()` — `dags/tutorial_dag.py:84-89`). Truncate-safe show
    * of the first n rows; an action, used at pipeline ends only. */
  def console(df: DataFrame, n: Int = 5): Unit = df.show(n, truncate = false)

  /** S10: notification sink after an action (EmailOperator analog,
    * `dags/example_dag_decorator.py:69-71`). The hook is the engine
    * surface; [[LogNotifier]] logs, [[graft.sources.Smtp.notifier]]
    * delivers over real SMTP (SmtpSpec: loopback round-trip). */
  trait Notifier { def notify(to: String, subject: String, body: String): Unit }
  object LogNotifier extends Notifier {
    private val log = org.apache.log4j.Logger.getLogger(getClass)
    def notify(to: String, subject: String, body: String): Unit =
      log.info(s"[notify to=$to] $subject: $body")
  }
}
