package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, IvfPq, Pq}

/** Measured backing for the ANN-layout scale claims in PLANS.md: the
  * compression ("PQ codes are ~64× smaller than floats") and pruning
  * ("a probe touches only the probed cluster directories") levers are
  * stated as arithmetic in the scaladoc — this probe measures them on
  * the real sf corpus, in bytes on disk, so the claims are data.
  *
  * For each layout (IVF float / IVF SQ8 / flat PQ codes / IVFPQ) it
  * reports the total on-disk size and bytes-per-vector; for the
  * partitioned layouts it then derives a SINGLE query's probe set
  * (nprobe=4 of 16; a 10-query batch covers most clusters between
  * them, so per-query is the meaningful I/O unit) — the same
  * `probeAssignments` the serving path pushes as its partition filter
  * (IvfSpec/IvfPqSpec pin that the filter lands in PartitionFilters
  * and that exactly these directories are read) — and reports the
  * TOUCHED bytes: the physical I/O bound of the probe.
  *
  * Usage: `runMain graft.IndexProbe [sfDir]` — one line per
  * measurement.
  */
object IndexProbe {

  private def dirBytes(spark: org.apache.spark.sql.SparkSession,
      path: String, sub: Option[Set[Int]] = None): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      val parent = f.getPath.getParent.getName
      val keep = name.startsWith("part-") && (sub match {
        case None => true
        case Some(clusters) =>
          parent.startsWith("cluster=") &&
            clusters.contains(parent.stripPrefix("cluster=").toInt)
      })
      if (keep) total += f.getLen
    }
    total
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.builder("graft-indexprobe", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    val centroids = Ivf.trainCentroids(emb, 16, iters = 3, trainFraction = 0.25)
    val codebooks = Pq.trainCodebooks(emb, dim = 64, m = 8, k = 16,
      iters = 2, trainFraction = 0.5)

    val base = graft.queries.scratchPath("indexprobe")
    val (pF, pQ, pP, pC) = (s"$base/ivf_float", s"$base/ivf_sq8",
      s"$base/ivfpq", s"$base/pq_codes")
    Ivf.writeIndexWithCentroids(emb, pF, centroids)
    Ivf.appendIndexQuantized(emb, pQ, centroids)
    IvfPq.writeIndex(emb, pP, centroids, codebooks)
    Pq.writeIndex(emb, pC, codebooks)

    def mb(b: Long) = f"${b / 1048576.0}%.2f MiB"
    val (bF, bQ, bP, bC) =
      (dirBytes(spark, pF), dirBytes(spark, pQ), dirBytes(spark, pP),
        dirBytes(spark, pC))
    println(f"INDEXPROBE n=$n layout=ivf_float  total=${mb(bF)} bytes/vec=${bF.toDouble / n}%.1f")
    println(f"INDEXPROBE n=$n layout=ivf_sq8    total=${mb(bQ)} bytes/vec=${bQ.toDouble / n}%.1f (x${bF.toDouble / bQ}%.1f vs float)")
    println(f"INDEXPROBE n=$n layout=pq_codes   total=${mb(bC)} bytes/vec=${bC.toDouble / n}%.1f (x${bF.toDouble / bC}%.1f vs float)")
    println(f"INDEXPROBE n=$n layout=ivfpq      total=${mb(bP)} bytes/vec=${bP.toDouble / n}%.1f (x${bF.toDouble / bP}%.1f vs float)")

    // one query's probe set (nprobe=4 of 16): pruning is PER QUERY —
    // a 10-query batch covers most clusters between them (each pruned
    // to its own 4), so the single-query touch is the per-unit I/O
    // bound that scales with nprobe/nClusters, not with corpus size
    val probed = Ivf.probeAssignments(centroids,
        emb.filter(col("vec_id") === 0), 4, "vec_id", "embedding")
      .select(col("cluster")).distinct().collect().map(_.getInt(0)).toSet
    val (tF, tP) = (dirBytes(spark, pF, Some(probed)),
      dirBytes(spark, pP, Some(probed)))
    println(f"INDEXPROBE probe nprobe=4/16 queries=1 probedClusters=${probed.size}")
    println(f"INDEXPROBE touched ivf_float=${mb(tF)} (${100.0 * tF / bF}%.1f%% of layout)")
    println(f"INDEXPROBE touched ivfpq=${mb(tP)} (${100.0 * tP / bP}%.1f%% of layout, x${tF.toDouble / tP}%.1f less than float touch)")

    // residual refinement: same index size, tighter ADC — measure the
    // registered-config recall uplift vs the raw-coded layout
    val queries = emb.filter(col("vec_id") < 10)
    val brute = operators.Similarity.bruteForceTopK(emb, queries, 10)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.count(got.contains).toDouble / brute.size
    }
    val resCbs = IvfPq.trainResidualCodebooks(emb, centroids, dim = 64,
      m = 8, k = 16, iters = 2, trainFraction = 0.5)
    val pR = s"$base/ivfpq_res"
    IvfPq.writeIndexResidual(emb, pR, centroids, resCbs)
    val bR = dirBytes(spark, pR)
    for (nc <- Seq(20, 50, 100)) {
      val rRaw = recall(IvfPq.probeIndex(spark, pP, emb, centroids,
        codebooks, queries, k = 10, nprobe = 4, nCand = nc))
      val rRes = recall(IvfPq.probeIndexResidual(spark, pR, emb, centroids,
        resCbs, queries, k = 10, nprobe = 4, nCand = nc))
      println(f"INDEXPROBE recall@10 nprobe=4/16 nCand=$nc%d: raw=$rRaw%.3f residual=$rRes%.3f (residual layout ${mb(bR)})")
    }

    // SERVE-ONLY wall time per layout: the indexes above already exist
    // on disk — time the 10-query probe alone (warmup + 3 reps,
    // median; the Bench methodology), no training and no write in the
    // timed path. These are the numbers a capacity plan uses; q174
    // registers the IVFPQ row in BENCH_DETAIL, this prints the whole
    // family side by side.
    def timeProbe(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val (_, timed) = Bench.timeReps(mk)
      println(f"INDEXPROBE serve-only $label%-10s median=${Bench.median(timed)}%.3f s " +
        s"(reps in order: ${timed.map(t => f"$t%.3f").mkString(", ")})")
    }
    timeProbe("ivf_float") {
      Ivf.probeIndex(spark, pF, centroids, queries, k = 10, nprobe = 4) }
    timeProbe("ivf_sq8") {
      Ivf.probeIndexQuantized(spark, pQ, centroids, queries, k = 10, nprobe = 4) }
    timeProbe("pq_codes") {
      Pq.adcPrefilterTopKFromIndex(spark, pC, emb, queries, k = 10,
        nCand = 100, codebooks) }
    timeProbe("ivfpq") {
      IvfPq.probeIndex(spark, pP, emb, centroids, codebooks, queries,
        k = 10, nprobe = 4, nCand = 100) }
    timeProbe("ivfadc") {
      IvfPq.probeIndexResidual(spark, pR, emb, centroids, resCbs, queries,
        k = 10, nprobe = 4, nCand = 20) }
    spark.stop()
  }
}
