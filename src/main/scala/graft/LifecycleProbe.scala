package graft

import org.apache.spark.sql.functions._
import graft.operators.Zorder
import graft.sources.Tables

/** Phase-anatomy probe for the clustered-lifecycle bench queries
  * (q178/q181–q187 family): runs the q178 lifecycle once warm, then
  * times each phase separately over 3 reps — bootstrap write, append,
  * replay, tail compact, whole compact, box scan — so an optimization
  * round knows WHICH phase carries the seconds before touching the
  * (heavily spec-pinned) protocol code.
  *
  * Usage: runMain graft.LifecycleProbe
  * with SPARK_GRAFT_SF_DIR selecting the corpus (default sf0.1).
  */
object LifecycleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.builder("graft-lifecycle-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.load(spark, sfDir, "events")
    val boot = e.filter(col("event_id") % 5 =!= 0)
    val b1 = e.filter(col("event_id") % 5 === 0 && col("event_id") % 10 =!= 0)
    val b2 = e.filter(col("event_id") % 10 === 0)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lifecycle] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (0 to 3).foreach { rep =>
      val tag = if (rep == 0) "warmup" else s"rep$rep"
      println(s"[lifecycle] --- $tag ---")
      val tmp = queries.scratchPath(s"lcprobe_$rep")
      time("bootstrap write") {
        Zorder.writeHilbert(boot, tmp, Seq("user_id", "ts"),
          bits = 16, numFiles = 32)
      }
      time("append b1") { Zorder.appendClustered(b1, tmp, batchId = 1) }
      time("replay b1 (no-op)") { Zorder.appendClustered(b1, tmp, batchId = 1) }
      time("tail compact") {
        // step-level anatomy via the protocol test hook: the delta up
        // to "tail-sentinel" is the Spark work (locate + fold write),
        // the rest is protocol FS work (publish/manifest/sweep)
        val t0 = System.nanoTime()
        var last = t0
        Zorder.onProtocolStep = { step =>
          val now = System.nanoTime()
          println(f"[lifecycle]   tail step $step%-16s +${(now - last) / 1e9}%.3f s (t=${(now - t0) / 1e9}%.3f)")
          last = now
        }
        try Zorder.compactTail(spark, tmp)
        finally Zorder.onProtocolStep = _ => ()
      }
      time("append b2") { Zorder.appendClustered(b2, tmp, batchId = 2) }
      time("whole compact") { Zorder.compactClustered(spark, tmp) }
      time("box scan") {
        Zorder.readClustered(spark, tmp)
          .filter(col("user_id").between(2, 8) &&
            col("ts") >= to_timestamp(lit("2024-01-10 00:00:00")) &&
            col("ts") < to_timestamp(lit("2024-01-15 00:00:00")))
          .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
