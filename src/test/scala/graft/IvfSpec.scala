package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Similarity}
import graft.sources.Tables

/** Grades the IVF ANN path: training determinism, assignment totality,
  * exactness when probing every list, and recall/candidate-efficiency
  * when probing a fraction. */
class IvfSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("centroid training is deterministic and returns k × dim") {
    val a = Ivf.trainCentroids(emb, k = 8, iters = 2)
    val b = Ivf.trainCentroids(emb, k = 8, iters = 2)
    assert(a.size == 8)
    assert(a.forall(_.size == 64))
    assert(a == b, "same corpus + seeds must give identical centroids")
  }

  test("every vector is assigned to exactly one cluster in [0, k)") {
    val centroids = Ivf.trainCentroids(emb, k = 8, iters = 2)
    val clusters = emb.select(
        Ivf.assignCluster(centroids, col("embedding")).as("c"))
      .groupBy("c").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(clusters.keySet.forall(c => c >= 0 && c < 8))
    assert(clusters.values.sum == emb.count())
  }

  test("probing ALL lists is exactly brute force") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    val ivf = Ivf.ivfTopK(emb, queries, 10, nClusters = 8, nprobe = 8, iters = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    assert(ivf == exact, "nprobe = nClusters must degrade to the exact result")
  }

  test("partial probe: useful recall at a fraction of the candidates") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = Ivf.ivfTopK(emb, queries, 10, nClusters = 8, nprobe = 3, iters = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    info(s"IVF recall@10 = $recall at nprobe/nClusters = 3/8")
    // Uniform random vectors are k-means' adversarial case (weak
    // cluster structure); random candidate selection at 3/8 of the
    // corpus would give recall ≈ 0.375 — require clearly better.
    assert(recall >= 0.45, s"recall=$recall")
  }

  test("corpus smaller than nClusters: fewer centroids trained, probe-all still exact") {
    val tiny = emb.filter(col("vec_id") < 6)
    val centroids = Ivf.trainCentroids(tiny, k = 16, iters = 2)
    assert(centroids.size == 6, "seeding is bounded by the corpus size")
    val queries = tiny.filter(col("vec_id") < 2)
    val exact = Similarity.bruteForceTopK(tiny, queries, 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    // nClusters/nprobe far beyond the trained count must clamp, not
    // null-pad the probe list with phantom cluster ids
    val ivf = Ivf.ivfTopK(tiny, queries, 3, nClusters = 16, nprobe = 16, iters = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    assert(ivf == exact)
  }

  test("on-disk inverted lists: the probe scan prunes to the probed partitions") {
    val dir = Files.createTempDirectory("graft_ivf_idx_").toString
    val centroids = Ivf.writeIndex(emb, dir, nClusters = 8, iters = 2)
    assert(centroids.size == 8)
    // all 8 list directories exist on disk
    val onDisk = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("cluster=")).toSet
    assert(onDisk == (0 until 8).map(c => s"cluster=$c").toSet)

    // one query probing 3 of 8 lists — the pruning claim is per-query
    val q1 = emb.filter(col("vec_id") === 0)
    val expectedProbed = Ivf
      .probeAssignments(centroids, q1, nprobe = 3, "vec_id", "embedding")
      .select("cluster").distinct().collect().map(_.getInt(0)).toSet
    assert(expectedProbed.size == 3)

    val res = Ivf.probeIndex(spark, dir, centroids, q1, k = 5, nprobe = 3)

    // 1) plan: the cluster predicate lands in PartitionFilters
    //    (directory pruning at listing time), not PushedFilters
    val plan = res.queryExecution.executedPlan.toString
    // several scans appear (index + query side): find the one whose
    // PartitionFilters carries the static cluster IN-list
    assert("PartitionFilters: \\[[^\\]]*cluster[^\\]]* IN \\(".r
      .findFirstIn(plan).isDefined,
      s"cluster predicate did not reach PartitionFilters:\n$plan")

    // 2) behavior: the files feeding the probe live in EXACTLY the
    //    probed directories — 3 of the 8 lists, never the corpus
    val readDirs = spark.read.parquet(dir)
      .filter(col("cluster").isin(expectedProbed.toSeq.map(Int.box): _*))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0).split("/").init.last).toSet
    assert(readDirs == expectedProbed.map(c => s"cluster=$c"),
      s"scan touched $readDirs, expected ${expectedProbed.map(c => s"cluster=$c")}")

    // 3) result: identical to the in-memory probe path (training is
    //    deterministic, so same params give the same centroids)
    val inMem = Ivf.ivfTopK(emb, q1, k = 5, nClusters = 8, nprobe = 3, iters = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    val disk = res.collect().map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSet
    assert(disk == inMem)
  }

  test("SQ8-quantized lists: top-10 per query overlaps >=0.9 with the float path") {
    val dirF = Files.createTempDirectory("graft_ivf_f_").toString
    val dirQ = Files.createTempDirectory("graft_ivf_q_").toString
    // shared centroids so the ONLY difference is list storage precision
    // (the quantized layout bootstraps via appendIndexQuantized, which
    // takes the float layout's centroids verbatim)
    val centroids = Ivf.writeIndex(emb, dirF, nClusters = 8, iters = 2)
    Ivf.appendIndexQuantized(emb, dirQ, centroids)
    val queries = emb.filter(col("vec_id") < 20)
    def topSets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val f = topSets(Ivf.probeIndex(spark, dirF, centroids, queries, k = 10, nprobe = 4))
    val q = topSets(Ivf.probeIndexQuantized(spark, dirQ, centroids, queries, k = 10, nprobe = 4))
    assert(f.keySet == q.keySet)
    val overlaps = f.keySet.toSeq.map(id => (f(id) & q(id)).size.toDouble / 10.0)
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.9, s"mean top-10 overlap $mean < 0.9 (per-query: $overlaps)")
  }

  test("appendIndex: incremental batch append == whole-corpus rebuild") {
    // the q81/q92/q83 daily-ingest story extended to embeddings: day 1
    // trains + writes, day 2 assigns through the PERSISTED centroids
    // and appends — lists are pure facts under a fixed quantizer, so
    // the incremental layout must equal the pinned-centroid rebuild
    val b1 = emb.filter(col("vec_id") < 300)
    val b2 = emb.filter(col("vec_id") >= 300)
    val dirInc = Files.createTempDirectory("graft_ivf_inc_").toString
    val dirAll = Files.createTempDirectory("graft_ivf_all_").toString
    val centroids = Ivf.writeIndex(b1, dirInc, nClusters = 8, iters = 2)
    Ivf.appendIndex(b2, dirInc, centroids)
    Ivf.writeIndexWithCentroids(emb, dirAll, centroids)
    def triples(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    // probes must see day-1 and day-2 vectors alike through the
    // appended layout — exact parity with the rebuild, rank included
    val queries = emb.filter(col("vec_id") < 10)
    assert(triples(Ivf.probeIndex(spark, dirInc, centroids, queries, k = 10)) ==
      triples(Ivf.probeIndex(spark, dirAll, centroids, queries, k = 10)))
    // raw row parity too, not just probe results
    assert(spark.read.parquet(dirInc).count() ==
      spark.read.parquet(dirAll).count())
  }

  test("appendIndex fails fast on a centroid-set mismatch; bootstrap stamps the marker") {
    val b1 = emb.filter(col("vec_id") < 100)
    val b2 = emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
    val dir = Files.createTempDirectory("graft_ivf_guard_").toString
    val centroids = Ivf.writeIndex(b1, dir, nClusters = 4, iters = 2)
    // marker rides the layout
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_graft_centroids")))
    // a DIFFERENT quantizer (different k, and different values) must
    // be rejected before any write — appending through it would
    // scatter vectors into lists the probe ranking disagrees with
    val other = Ivf.trainCentroids(b2, k = 4, iters = 2)
    assert(other != centroids)
    for (bad <- Seq(other, centroids.take(3), centroids.map(_.map(_ + 1e-9)))) {
      val e = intercept[IllegalArgumentException](
        Ivf.appendIndex(b2, dir, bad))
      assert(e.getMessage.contains("does not match the existing layout"))
    }
    // matching centroids append fine
    Ivf.appendIndex(b2, dir, centroids)
    // bootstrap: a layout FIRST created via appendIndex still gets the
    // guard (the Postings appendIndex contract)
    val dirBoot = Files.createTempDirectory("graft_ivf_boot_").toString
    Ivf.appendIndex(b1, dirBoot, centroids)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dirBoot, "_graft_centroids")))
    val e = intercept[IllegalArgumentException](
      Ivf.appendIndex(b2, dirBoot, other))
    assert(e.getMessage.contains("does not match the existing layout"))
  }

  test("appendIndexQuantized: SQ8 append == SQ8 rebuild, same guard") {
    val b1 = emb.filter(col("vec_id") < 300)
    val b2 = emb.filter(col("vec_id") >= 300)
    val dirInc = Files.createTempDirectory("graft_ivfq_inc_").toString
    val dirAll = Files.createTempDirectory("graft_ivfq_all_").toString
    // train on b1, write its SQ8 lists; append b2 through the same
    // persisted centroids — must equal a full write under the SAME
    // centroids (per-row mn/qscale make quantized rows pure facts)
    val centroids = Ivf.writeIndexQuantized(b1, dirInc, nClusters = 8, iters = 2)
    Ivf.appendIndexQuantized(b2, dirInc, centroids)
    // rebuild: write b1 then append b2's complement-free full set via
    // two appends onto a bootstrap layout — same rows, different path
    Ivf.appendIndexQuantized(b1, dirAll, centroids)
    Ivf.appendIndexQuantized(b2, dirAll, centroids)
    def triples(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    val queries = emb.filter(col("vec_id") < 10)
    assert(triples(Ivf.probeIndexQuantized(spark, dirInc, centroids, queries, k = 10)) ==
      triples(Ivf.probeIndexQuantized(spark, dirAll, centroids, queries, k = 10)))
    assert(spark.read.parquet(dirInc).count() == emb.count())
    // mismatched quantizer rejected on the quantized path too
    val e = intercept[IllegalArgumentException](
      Ivf.appendIndexQuantized(b2, dirInc, centroids.map(_.map(_ + 1e-9))))
    assert(e.getMessage.contains("does not match the existing layout"))
  }

  test("flavor guard: float and SQ8 layouts reject each other even with matching centroids") {
    // both layouts share the marker file and directory scheme but not
    // the row schema: without the flavor token in the payload, a float
    // append through the CORRECT centroids onto an SQ8 layout would
    // pass the centroid check and mix row schemas the probe then
    // silently mis-decodes (null mn/qscale/codes on the float rows)
    val b1 = emb.filter(col("vec_id") < 100)
    val dirQ = Files.createTempDirectory("graft_ivf_flavor_q_").toString
    val centroids = Ivf.writeIndexQuantized(b1, dirQ, nClusters = 4, iters = 2)
    val e1 = intercept[IllegalArgumentException](
      Ivf.appendIndex(b1, dirQ, centroids))
    assert(e1.getMessage.contains("does not match the existing layout"))
    val e2 = intercept[IllegalArgumentException](
      Ivf.probeIndex(spark, dirQ, centroids, emb.filter(col("vec_id") < 5), k = 5))
    assert(e2.getMessage.contains("does not match the existing layout"))
    // and the mirror image: SQ8 append/probe onto a float layout
    val dirF = Files.createTempDirectory("graft_ivf_flavor_f_").toString
    Ivf.writeIndexWithCentroids(b1, dirF, centroids)
    val e3 = intercept[IllegalArgumentException](
      Ivf.appendIndexQuantized(b1, dirF, centroids))
    assert(e3.getMessage.contains("does not match the existing layout"))
    val e4 = intercept[IllegalArgumentException](
      Ivf.probeIndexQuantized(spark, dirF, centroids,
        emb.filter(col("vec_id") < 5), k = 5))
    assert(e4.getMessage.contains("does not match the existing layout"))
  }

  test("crash windows: unmarked lists refused, dead marker over empty path re-stamped") {
    val b1 = emb.filter(col("vec_id") < 100)
    val centroids = Ivf.trainCentroids(b1, k = 4, iters = 2)
    // (1) populated-but-MARKERLESS layout (a crashed rebuild cleared
    // the marker with the path and died before the re-stamp): append
    // and probe must refuse — the lists' quantizer is unknowable
    val dir = Files.createTempDirectory("graft_ivf_crash_").toString
    Ivf.writeIndexWithCentroids(b1, dir, centroids)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_graft_centroids"))
    val e1 = intercept[IllegalArgumentException](Ivf.appendIndex(b1, dir, centroids))
    assert(e1.getMessage.contains("no _graft_centroids marker"))
    val e2 = intercept[IllegalArgumentException](
      Ivf.probeIndex(spark, dir, centroids, emb.filter(col("vec_id") < 5), k = 5))
    assert(e2.getMessage.contains("no _graft_centroids marker"))
    // (2) marker over an EMPTY path (a bootstrap whose batch never
    // landed): a corrected-quantizer retry must re-stamp and succeed
    val dir2 = Files.createTempDirectory("graft_ivf_dead_").toString
    Ivf.writeIndexWithCentroids(b1.limit(0), dir2, centroids.map(_.map(_ + 1.0)))
    // ^ zero-row write leaves the wrong-quantizer marker and no data
    Ivf.appendIndex(b1, dir2, centroids)
    val got = Ivf.probeIndex(spark, dir2, centroids,
      emb.filter(col("vec_id") < 5), k = 5).count()
    assert(got > 0)
  }

  test("training on a sample still assigns the full corpus") {
    val centroids = Ivf.trainCentroids(emb, k = 4, iters = 2, trainFraction = 0.5)
    assert(centroids.size == 4)
    val n = emb.select(Ivf.assignCluster(centroids, col("embedding")).as("c"))
      .filter(col("c").isNotNull).count()
    assert(n == emb.count())
  }
}
