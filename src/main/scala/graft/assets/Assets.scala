package graft.assets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset/asset layer (SURVEY.md §2.1 S12, §2.9 T2–T6): URI-identified
  * data assets whose *update events* drive downstream pipelines —
  * the reference's Dataset / dataset-event / DatasetAlias machinery
  * (`dags/example_datasets.py:64-192`,
  * `dags/example_outlet_event_extra.py:44-79`,
  * `dags/example_dataset_alias.py:66-99`).
  *
  * The event log is itself a parquet table (append-only, schema
  * (asset, seq, ts_ms, extra)) — queryable as a DataFrame like any
  * other engine table, which is exactly how consumers use it
  * (`inlet_events[ds].extra`, slicing `[:-2]`, `[-1]`). The registry
  * and trigger conditions are driver-side state (SURVEY §7 risk (c):
  * boolean conditions are stateful across events — keep them in one
  * registry, not in streaming state).
  */
final case class Asset(name: String, path: String,
    extra: Map[String, String] = Map.empty)

class AssetRegistry(spark: SparkSession, logDir: String) {

  private val assets = scala.collection.mutable.LinkedHashMap.empty[String, Asset]
  private val aliases = scala.collection.mutable.LinkedHashMap.empty[String, String]
  // seq RESUMES from the durable log, not from 0: the log outlives the
  // JVM, and a fresh registry reusing low seq numbers would make
  // lastEventExtra return stale events and freeze every watcher whose
  // checkpoint already passed them (eventsSince(highSeq) == empty
  // forever)
  private val seq = new java.util.concurrent.atomic.AtomicLong({
    val r = eventsRaw().agg(max(col("seq"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  })

  def register(a: Asset): Asset = { assets(a.name) = a; a }

  /** T6: late-bound alias — resolved at use time, so re-pointing the
    * alias re-routes every consumer. */
  def alias(name: String, target: String): Unit = {
    require(assets.contains(target), s"alias target unknown: $target")
    aliases(name) = target
  }

  def resolve(nameOrAlias: String): Asset =
    assets.getOrElse(aliases.getOrElse(nameOrAlias, nameOrAlias),
      throw new NoSuchElementException(s"unknown asset: $nameOrAlias"))

  /** T5: record an update event with producer extras. */
  def recordEvent(nameOrAlias: String, extra: Map[String, String] = Map.empty): Unit = {
    import spark.implicits._
    val a = resolve(nameOrAlias)
    val row = Seq((a.name, seq.incrementAndGet(), System.currentTimeMillis(), extra))
      .toDF("asset", "seq", "ts_ms", "extra")
    row.write.mode("append").parquet(s"$logDir/events")
  }

  /** Read the raw event log; an empty frame ONLY when the log doesn't
    * exist yet. Any other read failure (corrupt files, permissions)
    * propagates — swallowing it would silently freeze every watcher
    * on an empty view. */
  private def eventsRaw(): DataFrame =
    try spark.read.parquet(s"$logDir/events")
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getErrorClass).exists(_.contains("PATH_NOT_FOUND")) ||
            e.getMessage.toLowerCase.contains("path does not exist") =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "asset STRING, seq BIGINT, ts_ms BIGINT, extra MAP<STRING,STRING>"))
    }

  /** The ordered event log for one asset (or all with `name=None`). */
  def events(name: Option[String] = None): DataFrame = {
    val all = eventsRaw()
    name.fold(all)(n => all.filter(col("asset") === resolve(n).name))
      .orderBy(col("seq"))
  }

  /** Consumer-side slicing (`events[:-2]`, `events[-1]` —
    * `dags/example_inlet_event_extra.py:45,60`): the last event's
    * extras, if any. */
  def lastEventExtra(name: String): Option[Map[String, String]] = {
    val rows = events(Some(name)).orderBy(col("seq").desc).limit(1).collect()
    rows.headOption.map(r => Option(r.getMap[String, String](3))
      .map(_.toMap).getOrElse(Map.empty))
  }

  /** Producer convenience (E3): write a DataFrame to the asset's path
    * and record the update event — the `outlets=[ds]` contract. */
  def writeAsset(df: DataFrame, nameOrAlias: String,
      extra: Map[String, String] = Map.empty): Unit = {
    val a = resolve(nameOrAlias)
    df.write.mode("overwrite").parquet(a.path)
    recordEvent(nameOrAlias, extra)
  }

  def readAsset(nameOrAlias: String): DataFrame =
    spark.read.parquet(resolve(nameOrAlias).path)

  /** Events with seq greater than a checkpoint — the watcher's view. */
  def eventsSince(sinceSeq: Long): Set[String] =
    events(None).filter(col("seq") > sinceSeq)
      .select("asset").distinct().collect().map(_.getString(0)).toSet
}

/** T3: boolean dataset conditions (`d1 & d2`, `d1 | (d2 & d3)` —
  * `dags/example_datasets.py:149-178`). Evaluated against the set of
  * assets updated since the consumer's checkpoint. */
sealed trait Cond {
  def &(o: Cond): Cond = Cond.And(this, o)
  def |(o: Cond): Cond = Cond.Or(this, o)
  def eval(updated: Set[String]): Boolean = this match {
    case Cond.On(a) => updated.contains(a)
    case Cond.And(l, r) => l.eval(updated) && r.eval(updated)
    case Cond.Or(l, r) => l.eval(updated) || r.eval(updated)
  }
}
object Cond {
  final case class On(asset: String) extends Cond
  final case class And(l: Cond, r: Cond) extends Cond
  final case class Or(l: Cond, r: Cond) extends Cond
}

/** T2/T4: consumer-side watcher — "run when my condition fires" (or on
  * a time tick, the DatasetOrTimeSchedule hybrid). Polls the event log;
  * each check advances the checkpoint only when it fires, so updates
  * are never lost between checks. */
class AssetWatcher(registry: AssetRegistry, cond: Cond) {
  private var checkpoint = 0L

  /** If the condition holds on events since the checkpoint, advance the
    * checkpoint and return the updated asset names (the trigger). */
  def poll(): Option[Set[String]] = {
    val events = registry.events(None)
      .agg(max(col("seq"))).collect()(0)
    val latest = if (events.isNullAt(0)) 0L else events.getLong(0)
    val updated = registry.eventsSince(checkpoint)
    if (cond.eval(updated)) { checkpoint = latest; Some(updated) } else None
  }
}
