package graft


/** Targeted bench probe: reruns Bench's exact methodology (noop-sink
  * consume, one warmup rep, three timed reps, median) for the named
  * queries only, in the order given, in a fresh JVM — the tool for
  * chasing single-query excursions in a driver-side BENCH_r{N} stamp
  * without paying a full-suite run per observation.
  *
  * Unlike Bench it prints EVERY rep (warmup included), because the
  * excursions it exists to probe are first-touch effects (JIT/classload
  * of a path's first execution in bench order) that a median hides.
  *
  * Usage: runMain graft.BenchProbe <q141_phrase_search> [more...]
  * with SPARK_GRAFT_SF_DIR selecting the corpus (default sf0.1).
  */
object BenchProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchProbe <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.builder("graft-bench-probe").getOrCreate()
    // SPARK_GRAFT_LOGLEVEL=INFO turns on DAGScheduler per-job timing
    // lines ("Job N finished: …, took X s") — the cheapest per-job
    // anatomy of a single query without instrumenting the operators
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    args.foreach { name =>
      val q = byName.getOrElse(name,
        sys.error(s"unknown query '$name' (full key required, e.g. q141_phrase_search)"))
      // per-rep lines print LIVE (as each rep completes), so a rep
      // that hangs or OOMs doesn't take the already-measured ones
      // with it — the whole point of a probe chasing an excursion
      val (warm, timed) = Bench.timeReps(q.fn(spark, sfDir), onRep = {
        case (0, s) => println(f"[probe] $name warmup $s%.3f s")
        case (i, s) => println(f"[probe] $name rep$i   $s%.3f s")
      })
      println(f"[probe] $name median ${Bench.median(timed)}%.3f s (warmup $warm%.3f)")
    }
    spark.stop()
  }
}
