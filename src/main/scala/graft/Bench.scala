package graft

import org.apache.spark.sql.DataFrame

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line the driver records as BENCH_r{N}.json.
  *
  * Methodology (fixes from round-1 verdict):
  *   - each query is fully CONSUMED through the `noop` sink — every
  *     operator (projections, sorts, joins) actually executes, unlike
  *     `.count()` which lets Catalyst prune non-limiting work;
  *   - per-query warmup run (codegen + shuffle-service warmup), then
  *     n=3 timed runs, median recorded;
  *   - failures are recorded per query (`"errors"` map) and fail the
  *     process exit code rather than silently contributing -1s.
  */
object Bench {

  /** The ONE consume used by every timing surface in the repo (Bench,
    * BenchProbe, IndexProbe): full materialization through the noop
    * sink, so every operator actually executes. */
  private[graft] def consume(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** The shared warmup + timed-reps harness: one warmup execution
    * (codegen, broadcast, classload), then `reps` timed executions,
    * CHRONOLOGICAL order preserved — the probes exist to expose
    * first-touch ordering effects, which a pre-sorted result hides.
    * `onRep(i, seconds)` fires as each rep COMPLETES (i = 0 is the
    * warmup) so a probe chasing an excursion still has the reps
    * already measured if a later one hangs or kills the JVM — probes
    * print from it; Bench leaves it silent. Returns
    * (warmupSeconds, timedSeconds). */
  private[graft] def timeReps(mk: => DataFrame, reps: Int = 3,
      onRep: (Int, Double) => Unit = (_, _) => ()): (Double, Seq[Double]) = {
    def one(i: Int): Double = {
      val t0 = System.nanoTime()
      consume(mk)
      val s = (System.nanoTime() - t0) / 1e9
      onRep(i, s)
      s
    }
    val w = one(0)
    (w, (1 to reps).map(one))
  }

  private[graft] def median(xs: Seq[Double]): Double =
    xs.sorted.apply(xs.length / 2)

  /** Pre-registered host-capacity canaries (floors in PLANS.md,
    * "Canary-normalized bench metric"): constant-path queries whose
    * code is frozen and whose plans have no optimizer decision left to
    * flip, re-timed at suite START / MIDDLE / END so the run carries
    * its own measurement of the host window it executed in. Three
    * classes on purpose — a pushed-filter scan, a scalar-library
    * projection, a join+agg composition — so one class-specific drift
    * (e.g. q62's fixed-overhead level shift) cannot masquerade as a
    * host window. Floors are sf0.1 idle medians; normalization is
    * sf0.1-only (the floors mean nothing at another scale). */
  // Floors RE-REGISTERED in round 17 (old: 0.52 / 0.12 / 0.87): the
  // per-path schema-inference cache (Tables.load) removed one footer-
  // reading Spark job from every query execution, canaries included —
  // keeping the stale floors would make every future factor read ~1.1
  // and value_normalized overstate the suite. Basis in PLANS.md
  // ("Canary floors re-registered, r17").
  private val canaryExpected: Seq[(String, Double)] = Seq(
    "q42_predicates" -> 0.46,
    "q44_scalar_breadth" -> 0.075,
    "q128_rm3_expansion" -> 0.85)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // parallelism comes from Session.defaultParallelism (env override or
    // all cores) — a private "4" fallback here would silently bench a
    // 4-core config on a 32-core host
    val spark = Session.builder("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]

    val benched = SparkEntry.all.filter(_.bench)
    val canaryDefs = canaryExpected.flatMap { case (n, e) =>
      benched.find(_.name == n).map(q => (q, e)) }
    val canaryStamps = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ListBuffer[Double]]
    // one warmup + one timed rep per canary per position: the canaries
    // are sub-second, so 3 positions × 3 canaries stay ~1% of the
    // suite; the per-canary statistic is the median of the 3 timed
    // stamps, which resists a single excursion while a genuine
    // capacity window (all three positions elevated) passes through
    def probeCanaries(): Unit = canaryDefs.foreach { case (q, _) =>
      try {
        val (_, runs) = timeReps(q.fn(spark, sfDir), reps = 1)
        canaryStamps.getOrElseUpdate(q.name,
          scala.collection.mutable.ListBuffer.empty) ++= runs
      } catch { case scala.util.control.NonFatal(_) => () }
    }

    probeCanaries()
    benched.zipWithIndex.foreach { case (q, i) =>
      if (i == benched.size / 2) probeCanaries()
      try {
        val (_, runs) = timeReps(q.fn(spark, sfDir))
        timings(q.name) = median(runs)
      } catch {
        // NonFatal only: after an OOM the JVM's medians are garbage —
        // better to die than publish them as trustworthy numbers
        case scala.util.control.NonFatal(e) =>
          errors(q.name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    probeCanaries()

    def jstr(s: String): String = Json.str(s)
    // Locale.ROOT: f"$v%.3f" uses the JVM default locale, which under
    // e.g. de_DE renders "1,234" — invalid JSON.
    val qs = timings.map { case (k, v) =>
      jstr(k) + ":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = timings.values.sum
    // canary normalization: factor = median over canaries of
    // (pre-registered idle floor / median observed stamp); the
    // normalized total projects the run onto the registered host
    // window, so a contaminated driver stamp and an idle stamp agree.
    // Clamped to [0.25, 4] — past 4× the host was so far gone the
    // projection itself is untrustworthy, and the clamp keeps one
    // broken canary from flipping the sign of a conclusion. sf0.1-only
    // (the floors are sf0.1 measurements).
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val sfIsFloorScale =
      sfDir.replaceAll("/+$", "").endsWith("sf0.1")
    // the suite-START stamp is systematically cold (JIT/heap state
    // before any query ran — measured 1.6-2.6x the floor on otherwise
    // clean runs) and measures the JVM, not the host; it stays in the
    // artifact for display but the factor uses mid/end stamps only
    val canaryRatios = canaryDefs.flatMap { case (q, exp) =>
      canaryStamps.get(q.name).map(_.toSeq.drop(1)).filter(_.nonEmpty)
        .map(st => exp / median(st)) }
    val canaryFactor =
      if (sfIsFloorScale && canaryRatios.nonEmpty)
        Some(math.min(4.0, math.max(0.25, median(canaryRatios))))
      else None
    val canariesJson = canaryDefs.map { case (q, exp) =>
      val st = canaryStamps.getOrElse(q.name,
        scala.collection.mutable.ListBuffer.empty[Double]).toSeq
      jstr(q.name) + ":{" + "\"expected\":" + fmt(exp) +
        ",\"observed\":" + (if (st.isEmpty) "null" else fmt(median(st))) +
        ",\"stamps\":[" + st.map(fmt).mkString(",") + "]}"
    }.mkString("{", ",", "}")
    val normFields = canaryFactor match {
      case Some(f) =>
        s""","value_normalized":${fmt(total * f)},"canary_factor":${fmt(f)}"""
      case None => ""
    }
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec"$normFields,"canaries":$canariesJson,"queries":$qs,"errors":$errs,"sf":${Json.str(sfDir)}}"""
    // The driver's stdout pickup reads a bounded tail window: with 77+
    // benched queries the per-query map overflows it and the line
    // truncates mid-map (BENCH_r06 `parsed: null`). So stdout carries
    // ONLY a compact summary line — total, count, errors — and the
    // full per-query map goes to stderr and target/bench_last.json
    // (the reliable pickups; sbt also appends its own "[success] …"
    // after us on stdout, so stdout was never the durable channel).
    // The errors map is bounded too: a mass-failure run (every query
    // erroring × 200-char messages) would overflow the same window
    // exactly when the report matters most — cap at 5 entries with
    // truncated messages, count the rest (full text in the file).
    val errsCompact = {
      val shown = errors.take(5).map { case (k, v) => jstr(k) + ":" + jstr(v.take(80)) }
      val extra =
        if (errors.size > 5)
          Seq(jstr("_truncated") + ":" +
            jstr(s"${errors.size} errors total, full text in target/bench_last.json"))
        else Seq.empty
      (shown ++ extra).mkString("{", ",", "}")
    }
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec"$normFields,"n_queries":${timings.size},"errors":$errsCompact,"sf":${Json.str(sfDir)}}"""
    println(compact)
    System.err.println(json)
    // Best-effort: a missing/read-only cwd must not fail a bench run
    // whose results were already printed.
    // Independent best-effort writes: one unwritable path must not
    // take down the other copy.
    def writeArtifact(path: String, content: String, mkdirs: Boolean): Unit =
      try {
        val p = java.nio.file.Paths.get(path)
        if (mkdirs && p.getParent != null)
          java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, content + "\n")
      } catch {
        case e: java.io.IOException =>
          System.err.println(s"[bench] could not write $path: $e")
      }
    def writeDetail(path: String, mkdirs: Boolean): Unit =
      writeArtifact(path, json, mkdirs)
    // Repo root first: the driver's tail window truncates
    // BENCH_r{N}.json's per-query map (r7 lost q01–q09), but an
    // uncommitted file in the tree survives via the end-of-round
    // snapshot commit, so per-query history stays diffable.
    writeDetail("BENCH_DETAIL.json", mkdirs = false)
    writeDetail("target/bench_last.json", mkdirs = true)
    // Contract grades for the no_oracle queries (q15/q34/q38/q52/q79/
    // q91/q134/q138): re-measure each query's spec contract on the
    // bench corpus so the gate sees graded numbers instead of
    // `err: no_oracle`. Best-effort like the detail writes — a broken
    // contract run must not eat the timings already printed — but any
    // red contract or measurement error is called out on stderr.
    try {
      val (rows, cErrs) = Contracts.measure(spark, sfDir)
      val cJson = Contracts.toJson(rows, cErrs, sfDir)
      writeArtifact("CONTRACTS.json", cJson, mkdirs = false)
      writeArtifact("target/contracts_last.json", cJson, mkdirs = true)
      rows.filterNot(_.pass).foreach(c => System.err.println(
        s"[bench] CONTRACT FAILED ${c.query}: ${c.contract} = ${c.measured} " +
          s"(need ${c.op} ${c.threshold})"))
      cErrs.foreach { case (q, e) =>
        System.err.println(s"[bench] contract error $q: $e") }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] contract run failed: $e")
    }
    // Quiet shutdown, then RE-emit the compact line as the absolute
    // final stdout statement: r8's summary printed before spark.stop(),
    // whose shutdown logging pushed it out of the driver's bounded tail
    // window (BENCH_r08 `parsed: null`). Printing it last — after the
    // SparkContext is fully stopped — leaves only sbt's own success
    // marker between the line and the window's edge.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(compact)
    if (errors.nonEmpty) sys.exit(1)
  }
}
