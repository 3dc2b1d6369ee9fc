package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Zorder

/** Pins the Morton-code arithmetic and the layout guarantees of
  * [[Zorder]]: interleave parity with a reference software
  * implementation, per-dimension monotonicity, exact row round-trip
  * through a z-ordered rewrite, degenerate inputs (constant column,
  * NULLs), and the zone-map property the layout exists for — every
  * clustered dimension's per-file bounding box is narrow, so a
  * 2-D box predicate intersects a strict subset of files.
  */
class ZorderSpec extends SparkSpec {

  /** Order-insensitive content fingerprint (count + decimal-summed
    * row hash) — the one round-trip check both rewrite tests share. */
  private def fp(df: org.apache.spark.sql.DataFrame) =
    df.agg(count(lit(1)).as("n"),
      sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")).as("ck"))
      .collect()(0)

  private def refMorton(xs: Seq[Long], bits: Int): Long = {
    val d = xs.length
    var z = 0L
    for (b <- 0 until bits; i <- 0 until d)
      z |= ((xs(i) >> b) & 1L) << (b * d + (d - 1 - i))
    z
  }

  test("interleave matches a reference Morton code on the full 2D grid") {
    val s = spark
    import s.implicits._
    val bits = 3
    val grid = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
    val got = grid.select(col("x"), col("y"),
        Zorder.interleave(Seq(col("x"), col("y")), bits).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (x <- 0L until 8L; y <- 0L until 8L)
      assert(got((x, y)) == refMorton(Seq(x, y), bits),
        s"z($x,$y) mismatch vs reference interleave")
    // and a 3-dimension sample
    val z3 = spark.range(1).select(Zorder.interleave(
      Seq(lit(5L), lit(3L), lit(6L)), 3).as("z")).head().getLong(0)
    assert(z3 == refMorton(Seq(5L, 3L, 6L), 3))
  }

  test("monotone in each dimension with the others fixed") {
    // on the PRODUCTION interleave expression (not the reference
    // helper — asserting refMorton against itself pins nothing), at a
    // bits width the parity grid above does not cover
    val s = spark
    import s.implicits._
    val bits = 5
    val z = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Zorder.interleave(Seq(col("x"), col("y")), bits).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // BOTH dimensions asserted on the production expression — a dim-1
    // check against the reference helper alone pins nothing
    for (y <- Seq(0L, 13L, 31L); x <- 0L until 31L)
      assert(z((x, y)) < z((x + 1, y)),
        s"z not monotone in dim 0 at ($x,$y)")
    for (x <- Seq(0L, 13L, 31L); y <- 0L until 31L)
      assert(z((x, y)) < z((x, y + 1)),
        s"z not monotone in dim 1 at ($x,$y)")
  }

  test("z-ordered rewrite round-trips every row exactly") {
    val e = sources.Tables.load(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_zorder_rt_").toString
    Zorder.writeZordered(e, dir, Seq("user_id", "ts"), bits = 16,
      numFiles = 8)
    val back = spark.read.parquet(dir)
    val (a, b) = (fp(e.select(back.columns.map(col): _*)), fp(back))
    assert(a.getLong(0) == b.getLong(0) && a.getDecimal(1) == b.getDecimal(1),
      "z-ordered layout must hold exactly the source rows")
  }

  test("degenerate inputs: constant column, NULLs, bad params refused") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0)).toDF("id", "c")
      .union(Seq((4L, Double.NaN)).toDF("id", "c"))
      .withColumn("c", when(col("id") === 4L, lit(null)).otherwise(col("c")))
    // constant dimension (max == min) and a NULL both bucket to 0 —
    // the z-value stays defined for every row
    val z = df.select(Zorder.interleave(Seq(
      Zorder.bucket(col("c"), 5.0, 5.0, 8),
      Zorder.bucket(col("id"), 1.0, 4.0, 8)), 8).as("z")).collect()
    assert(z.forall(r => !r.isNullAt(0) && r.getLong(0) >= 0))
    intercept[IllegalArgumentException](
      Zorder.interleave(Seq(col("id")), 8)) // 1-D: use a plain sort
    intercept[IllegalArgumentException](
      Zorder.interleave(Seq(col("id"), col("c")), 32)) // 64 bits > 63
  }

  test("per-file boxes are narrow in BOTH dimensions; a 2D box prunes files") {
    val e = sources.Tables.load(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_zorder_box_").toString
    Zorder.writeZordered(e, dir, Seq("user_id", "value"), bits = 16,
      numFiles = 8)
    val boxes = Zorder.boundingBoxes(spark, dir, Seq("user_id", "value"))
      .collect()
    assert(boxes.length == 8, s"expected 8 files, got ${boxes.length}")
    // the measurement a pruning reader makes: which files' boxes
    // intersect a narrow 2D predicate box? A 1D-sorted layout bounds
    // only its sort column; z-order must bound both, so a box that is
    // narrow in EACH dimension intersects strictly fewer than all.
    // The box must sit INSIDE this sf's data domain (sf0.001: user_id
    // 0–14, value ~0–330) — an out-of-domain box touches zero files
    // and the assertion goes vacuous, passing for an unsorted layout.
    val (uLo, uHi, vLo, vHi) = (2L, 8L, 60.0, 120.0)
    val touched = boxes.count { r =>
      r.getLong(1) <= uHi && r.getLong(2) >= uLo &&
        r.getDouble(3) <= vHi && r.getDouble(4) >= vLo
    }
    assert(touched > 0, "in-domain box touched no file — test is vacuous")
    assert(touched < boxes.length,
      s"2D box touched all $touched files — layout is not clustering")
  }

  /** Classic xy2d (public-domain algorithm), the reference for the
    * native hilbert_d2 expression. */
  private def refHilbert(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbert_d2 matches the reference xy2d on the full grid; curve is adjacent") {
    val s = spark
    import s.implicits._
    val bits = 4
    val grid = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        org.apache.spark.sql.GraftColumn.of(graft.functions.HilbertCode(
          org.apache.spark.sql.GraftColumn.expr(col("x")),
          org.apache.spark.sql.GraftColumn.expr(col("y")), bits)).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (x <- 0L until 16L; y <- 0L until 16L)
      assert(grid((x, y)) == refHilbert(x, y, bits),
        s"hilbert($x,$y) mismatch vs reference xy2d")
    // the property Morton LACKS and the layout exists for: consecutive
    // curve positions are ADJACENT cells (|dx|+|dy| = 1), so a box
    // cuts the curve into few long runs — a bijection check rides
    // along (every d in [0, 256) hit exactly once)
    val byD = grid.map { case ((x, y), d) => d -> (x, y) }
    assert(byD.size == 256, "hilbert_d2 is not a bijection on the grid")
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps between d=$d ($x1,$y1) and d=${d + 1} ($x2,$y2)")
    }
    // the SQL registration resolves too
    val viaSql = spark.sql("SELECT hilbert_d2(5L, 3L, 4)").head().getLong(0)
    assert(viaSql == refHilbert(5L, 3L, 4))
  }

  test("hilbert rewrite round-trips and prunes a 2D box") {
    val e = sources.Tables.load(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_hilbert_rt_").toString
    Zorder.writeHilbert(e, dir, Seq("user_id", "value"), bits = 16,
      numFiles = 8)
    val back = spark.read.parquet(dir)
    val (a, b) = (fp(e.select(back.columns.map(col): _*)), fp(back))
    assert(a.getLong(0) == b.getLong(0) && a.getDecimal(1) == b.getDecimal(1),
      "hilbert layout must hold exactly the source rows")
    val boxes = Zorder.boundingBoxes(spark, dir, Seq("user_id", "value"))
      .collect()
    val touched = boxes.count { r =>
      r.getLong(1) <= 8L && r.getLong(2) >= 2L &&
        r.getDouble(3) <= 120.0 && r.getDouble(4) >= 60.0
    }
    assert(touched > 0 && touched < boxes.length,
      s"2D box touched $touched of ${boxes.length} files")
    intercept[IllegalArgumentException](Zorder.writeHilbert(
      e, dir, Seq("user_id", "value", "event_id"), bits = 8, numFiles = 8))
  }

  test("rankBucket matches a reference binary search, boundary-exact") {
    val s = spark
    import s.implicits._
    val bounds = Seq(1.0, 3.5, 3.5, 10.0, 100.0).distinct // dedup like prod
    def ref(v: Double) = bounds.count(v >= _).toLong
    val vals = Seq(0.0, 1.0, 1.0001, 3.4999, 3.5, 9.9, 10.0, 99.0, 100.0,
      100.1, -5.0)
    val got = vals.toDF("v")
      .select(col("v"), Zorder.rankBucket(col("v"), bounds).as("b"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    vals.foreach(v => assert(got(v) == ref(v),
      s"rankBucket($v) = ${got(v)}, reference ${ref(v)}"))
    // NULL -> bucket 0 (descends the false branch at every split)
    val nb = Seq(Option.empty[Double]).toDF("v")
      .select(Zorder.rankBucket(col("v"), bounds).as("b")).head().getLong(0)
    assert(nb == 0L)
  }

  test("rank quantization spreads a heavy-tailed column; uniform does not") {
    val s = spark
    import s.implicits._
    // value^2 of a uniform column is right-skewed: under equal-WIDTH
    // buckets the dense low region crams into bucket 0; equal-DEPTH
    // boundaries split it ~evenly — the property the rank mode exists
    // for, asserted on distinct bucket counts over the same data
    val e = sources.Tables.load(spark, sfDir, "events")
      .select((col("value") * col("value")).as("heat"))
    val bits = 4
    val r = e.agg(min(col("heat")).as("lo"), max(col("heat")).as("hi"))
      .head()
    val uniform = e.select(Zorder.bucket(col("heat"),
      r.getDouble(0), r.getDouble(1), bits).as("b"))
      .groupBy("b").count().collect()
    val bounds = Zorder.rankBoundaries(e, "heat", bits).toSeq
    val ranked = e.select(Zorder.rankBucket(col("heat"), bounds).as("b"))
      .groupBy("b").count().collect()
    val n = e.count().toDouble
    val uniMaxShare = uniform.map(_.getLong(1)).max / n
    val rankMaxShare = ranked.map(_.getLong(1)).max / n
    assert(uniMaxShare > 0.4,
      f"expected the skew pathology (got max share $uniMaxShare%.2f) — " +
        "corpus shape changed, re-pick the skew column")
    assert(rankMaxShare < 0.15,
      f"rank buckets must spread the tail (max share $rankMaxShare%.2f " +
        f"vs uniform $uniMaxShare%.2f)")
  }

  test("rank-z-ordered rewrite round-trips and prunes the dense region") {
    val e = sources.Tables.load(spark, sfDir, "events")
      .withColumn("heat", col("value") * col("value"))
    val dir = Files.createTempDirectory("graft_zorder_rank_").toString
    Zorder.writeZorderedByRank(e, dir, Seq("user_id", "heat"), bits = 6,
      numFiles = 8)
    val back = spark.read.parquet(dir)
    // content fingerprint, not just count — equal-count corruption
    // (dropped+duplicated rows, mangled values, a leaked __graft_zb_*
    // stage column) must fail
    assert(back.columns.sorted.sameElements(e.columns.sorted),
      s"schema changed through the rank rewrite: ${back.columns.mkString(",")}")
    val (a, b) = (fp(e.select(back.columns.map(col): _*)), fp(back))
    assert(a.getLong(0) == b.getLong(0) && a.getDecimal(1) == b.getDecimal(1),
      "rank layout must hold exactly the source rows")
    val boxes = Zorder.boundingBoxes(spark, dir, Seq("user_id", "heat"))
      .collect()
    // a box in the DENSE low-heat region, where uniform quantization
    // has no resolution at all: rank clustering must still prune
    val touched = boxes.count { r =>
      r.getLong(1) <= 8L && r.getLong(2) >= 2L &&
        r.getDouble(3) <= 2500.0 && r.getDouble(4) >= 100.0
    }
    assert(touched > 0 && touched < boxes.length,
      s"dense-region box touched $touched of ${boxes.length} files")
  }
}
