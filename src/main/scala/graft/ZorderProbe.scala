package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Zorder
import graft.sources.Tables

/** Scale probe for the z-ordered layout (PLANS.md q175): writes the
  * events table four ways — UNSORTED, 1-D SORTED on user_id, and
  * MORTON- and HILBERT-clustered on (user_id, ts) — and measures, for 2-D box predicates,
  * what a pruning reader actually touches in each layout:
  *
  *   - decoded rows, from the executed plan's FileSourceScanExec
  *     `numOutputRows` — with parquet filter pushdown on and
  *     record-level filtering off (the defaults), this IS the
  *     row-group pruning result: rows in surviving row groups;
  *   - files and bytes whose per-file bounding box intersects the
  *     predicate box ([[Zorder.boundingBoxes]] — the zone-map math a
  *     file-skipping reader does);
  *   - the matching-row count (identical across layouts — the
  *     correctness anchor; q175's oracle pins it against DuckDB).
  *
  * The claim under measurement: a 1-D sort bounds ONLY its sort
  * column — its ts stats span the full month in every file, so a
  * predicate narrow in both dimensions decodes the full user-range
  * slice; the Morton layout bounds BOTH columns per file and decodes
  * near the true box. Wall times are deliberately not printed: at
  * sf0.1 every scan is milliseconds — decoded rows/bytes are the
  * quantities that scale to 100 TB.
  *
  * Predicate boxes are sized for the sf0.1 domain (user_id 0–1499,
  * ts 2024-01-01..31); pass a different SPARK_GRAFT_SF_DIR knowingly.
  * Usage: `runMain graft.ZorderProbe [numFiles]` — the file count is
  * the curve's resolution lever (32 files expose ~5 z bits, 128 ~7):
  * at 100 TB the layout has orders of magnitude more files, so the
  * decoded-rows gap between layouts WIDENS with this knob — run it at
  * 32 and 128 and compare.
  */
object ZorderProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.builder("graft-zorderprobe", cpus).getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // every layout gets stats-bearing timestamps so the comparison
    // is fair — writeZordered scopes this itself; the two baseline
    // layouts are written directly below (Spark's INT96 default has NO
    // stats: before this, the ts half of every box pruned nothing)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.load(spark, sfDir, "events")
    val tmp = queries.scratchPath("zprobe")
    val files = if (args.nonEmpty) args(0).toInt else 32

    // the layouts under comparison: same rows, same file count, different order
    e.repartition(files)
      .write.mode("overwrite").parquet(s"$tmp/unsorted")
    e.repartitionByRange(files, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(s"$tmp/sorted1d")
    Zorder.writeZordered(e, s"$tmp/zorder", Seq("user_id", "ts"),
      bits = 16, numFiles = files)
    Zorder.writeHilbert(e, s"$tmp/hilbert", Seq("user_id", "ts"),
      bits = 16, numFiles = files)

    case class Box(name: String, uLo: Long, uHi: Long, tLo: String, tHi: String)
    val boxes = Seq(
      // ~4% of users × ~17% of time: narrow in both dimensions — the
      // case a 1-D sort half-solves and z-order is built for
      Box("narrowXnarrow", 600, 659, "2024-01-10 00:00:00", "2024-01-15 00:00:00"),
      // ~40% of users × ~7% of time: the 1-D layout's weak spot grows
      // with the sort column's selectivity loss
      Box("wideXnarrow", 300, 899, "2024-01-20 00:00:00", "2024-01-22 00:00:00"))

    def pred(b: Box) = col("user_id").between(b.uLo, b.uHi) &&
      col("ts") >= to_timestamp(lit(b.tLo)) &&
      col("ts") < to_timestamp(lit(b.tHi))

    def decoded(df: DataFrame): (Long, Long) = {
      val agg = df.agg(count(lit(1)))
      val matching = agg.collect()(0).getLong(0)
      val scans = agg.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics.get("numOutputRows")
          .map(_.value).getOrElse(sys.error(
            s"numOutputRows missing on scan — metric renamed? " +
              s"available: ${s.metrics.keys.mkString(",")}"))
      }
      require(scans.nonEmpty, "no FileSourceScanExec in the executed plan")
      (matching, scans.sum)
    }

    val fsRoot = new org.apache.hadoop.fs.Path(tmp)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)

    Seq("unsorted", "sorted1d", "zorder", "hilbert").foreach { layout =>
      val path = s"$tmp/$layout"
      // the ONE hidden-name definition (Layout.isHidden), so local-FS
      // .crc checksum sidecars don't inflate the byte denominator
      val sizes = fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(st => !graft.operators.Layout.isHidden(st.getPath.getName))
        .map(st => st.getPath.getName -> st.getLen).toMap
      val bb = Zorder.boundingBoxes(spark, path, Seq("user_id", "ts"))
        .collect()
      boxes.foreach { b =>
        val (matching, dec) =
          decoded(spark.read.parquet(path).filter(pred(b)))
        // parse as UTC explicitly: the scan predicate's to_timestamp
        // resolves in the session timezone (forced UTC), and
        // Timestamp.valueOf would use the JVM default — on a non-UTC
        // host the box math would measure a box shifted by the offset
        def utc(s: String) = java.sql.Timestamp.from(
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            .atZone(java.time.ZoneOffset.UTC).toInstant)
        val (tLo, tHi) = (utc(b.tLo), utc(b.tHi))
        val touched = bb.filter { r =>
          r.getLong(1) <= b.uHi && r.getLong(2) >= b.uLo &&
            r.getTimestamp(3).before(tHi) && !r.getTimestamp(4).before(tLo)
        }
        val touchedBytes = touched.map(r =>
          sizes(r.getString(0).split('/').last)).sum
        println(s"ZORDERPROBE layout=$layout box=${b.name} " +
          s"matching=$matching decodedRows=$dec " +
          s"filesTouched=${touched.length}/${bb.length} " +
          s"bytesTouched=${touchedBytes / 1024}/${sizes.values.sum / 1024}KiB")
      }
    }

    // ----- incremental lifecycle: tail pruning before/after compact -----
    // the append == rebuild story in decoded rows: bootstrap 80%,
    // append the rest in four batchId-keyed batches (each z-sorted
    // into 2 tight files), measure the box BEFORE compaction (the
    // pruning debt of the tail) and AFTER (the restored grid), against
    // the all-rows single write above. The claim under measurement:
    // appended batch files are themselves tight (each covers a narrow
    // z-range), so the pre-compact penalty is bounded by the number of
    // TAIL FILES INTERSECTING the box — not by tail row count — and
    // compaction returns the layout to single-write pruning.
    val inc = s"$tmp/hilbert_inc"
    Zorder.writeHilbert(e.filter(col("event_id") % 5 =!= 0), inc,
      Seq("user_id", "ts"), bits = 16, numFiles = files)
    (0 until 4).foreach { b =>
      Zorder.appendClustered(
        e.filter(col("event_id") % 5 === 0 && col("event_id") % 4 === b),
        inc, batchId = b, batchFiles = 2)
    }
    boxes.foreach { bx =>
      val (m1, d1) = decoded(spark.read.parquet(inc).filter(pred(bx)))
      println(s"ZORDERPROBE layout=hilbertAppended box=${bx.name} " +
        s"matching=$m1 decodedRows=$d1")
    }
    Zorder.compactClustered(spark, inc)
    boxes.foreach { bx =>
      val (m2, d2) = decoded(spark.read.parquet(inc).filter(pred(bx)))
      println(s"ZORDERPROBE layout=hilbertCompacted box=${bx.name} " +
        s"matching=$m2 decodedRows=$d2")
    }

    // ----- tail-scoped compaction: rewrite ∝ tail; parity with whole -----
    // the amortized-ingest claim (Zorder.compactTail), measured in TWO
    // regimes on a TIME-LEADING layout (the choice a daily-ingest
    // table makes — with user_id leading, any time-batch interleaves
    // across every user region and the fold honestly degrades toward
    // the whole-layout rewrite):
    //   - backfill: the batch's keys lie INSIDE the pinned bounds
    //     (late-arriving data, or a domain bootstrapped with headroom —
    //     the recommended shape for an append-heavy dimension) — full
    //     quantization resolution, tight tail intervals, few residents
    //     folded;
    //   - newdays: the batch lies BEYOND the pinned ts bound, so every
    //     row CLAMPS to the top bucket — intra-batch resolution is
    //     gone and the top-slab z-span folds a fixed fraction of the
    //     layout (the documented cost of pinned quantization without
    //     headroom; a periodic rebuild re-derives the bounds).
    // Measured per regime: bytes REWRITTEN (tail + overlapped
    // residents) vs total layout bytes, and decoded rows vs a
    // WHOLE-compacted twin of the same lifecycle on identical boxes.
    def dataSizes(dir: String): Map[String, Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(st => !st.isDirectory &&
          !graft.operators.Layout.isHidden(st.getPath.getName))
        .map(st => st.getPath.getName -> st.getLen).toMap
    def tsIn(lo: String, hi: String) =
      col("ts") >= to_timestamp(lit(lo)) && col("ts") < to_timestamp(lit(hi))
    // the fold is VALUE-level (a resident folds iff a tail z-value
    // lands inside its interval), so batchFiles does not move the fold
    // size — the two regimes run at DIFFERENT batchFiles (2 and 8) as
    // the independence check; under the earlier hull-based cut, 2
    // files dragged 13 residents in for the 6.5% backfill slab
    Seq(
      ("backfill", tsIn("2024-01-20 00:00:00", "2024-01-22 00:00:00"), 2),
      ("newdays", tsIn("2024-01-30 00:00:00", "2024-02-01 00:00:00"), 8)
    ).foreach { case (kind, batchPred, batchFiles) =>
      val tl = s"$tmp/hilbert_tail_$kind"
      val wl = s"$tmp/hilbert_whole_$kind"
      Seq(tl, wl).foreach { dir =>
        Zorder.writeHilbert(e.filter(!batchPred), dir,
          Seq("ts", "user_id"), bits = 16, numFiles = files)
        Zorder.appendClustered(e.filter(batchPred), dir,
          batchId = 1, batchFiles = batchFiles)
      }
      val pre = dataSizes(tl)
      require(Zorder.compactTail(spark, tl), "probe tail must fold")
      val post = dataSizes(tl)
      val folded = pre.filter { case (n, _) => !post.contains(n) }
      val tailNames = pre.keySet.filter(_.matches("b\\d+-.*"))
      println(s"ZORDERPROBE tailcompact kind=$kind " +
        s"totalKiB=${pre.values.sum / 1024} " +
        s"tailKiB=${tailNames.toSeq.map(pre).sum / 1024} " +
        s"rewrittenKiB=${folded.values.sum / 1024} " +
        s"untouchedKiB=${(pre.values.sum - folded.values.sum) / 1024} " +
        s"foldedFiles=${folded.size - tailNames.size}main+" +
        s"${tailNames.size}tail of ${pre.size - tailNames.size}main")
      Zorder.compactClustered(spark, wl)
      // parity on the standard boxes plus a box over the batch itself
      // (the region the fold rewrote)
      val batchBox = if (kind == "backfill")
        Box("batchRegion", 300, 899, "2024-01-20 00:00:00", "2024-01-22 00:00:00")
      else
        Box("batchRegion", 300, 899, "2024-01-30 00:00:00", "2024-02-01 00:00:00")
      (boxes :+ batchBox).foreach { bx =>
        val (m1, d1) = decoded(spark.read.parquet(tl).filter(pred(bx)))
        val (m2, d2) = decoded(spark.read.parquet(wl).filter(pred(bx)))
        require(m1 == m2, s"row-parity broke on ${bx.name}: $m1 vs $m2")
        println(s"ZORDERPROBE layout=tailVsWhole kind=$kind box=${bx.name} " +
          s"matching=$m1 decodedTail=$d1 decodedWhole=$d2")
      }
    }

    // ----- 3-D: morton vs hilbert_dn on (user_id, ts, value) -----
    // the routing evidence for Zorder.writeBest at d >= 3: same rows,
    // same file count, same bits (12/dim — 36 curve bits), identical
    // 3-D box; only the curve differs. Hilbert's unit-step adjacency
    // holds at any d (HilbertCodeNSpec), so the 2-D dominance argument
    // carries — this measures it instead of assuming it.
    Zorder.writeZordered(e, s"$tmp/z3morton", Seq("user_id", "ts", "value"),
      bits = 12, numFiles = files)
    Zorder.writeHilbert(e, s"$tmp/z3hilbert", Seq("user_id", "ts", "value"),
      bits = 12, numFiles = files)
    val pred3 = col("user_id").between(300, 899) &&
      col("ts") >= to_timestamp(lit("2024-01-20 00:00:00")) &&
      col("ts") < to_timestamp(lit("2024-01-22 00:00:00")) &&
      col("value").between(50.0, 200.0)
    Seq("z3morton", "z3hilbert").foreach { layout =>
      val (matching, dec) =
        decoded(spark.read.parquet(s"$tmp/$layout").filter(pred3))
      println(s"ZORDERPROBE layout=$layout box=3d " +
        s"matching=$matching decodedRows=$dec")
    }

    // ----- rank vs uniform quantization under planted outliers -----
    // Equal-width quantization is one corrupt outlier away from
    // degenerate: a handful of sensor-glitch values 10⁶× the typical
    // range stretch [min,max] so far that EVERY normal row lands in
    // bucket 0 (the bucket ratio exceeds 2^bits), the heat dimension
    // carries zero information, and the curve collapses to a 1-D
    // user_id sort. Equal-depth (rank) boundaries are quantiles — a
    // few outliers move them by ~nothing. Mild skew alone does NOT
    // separate the modes AT THESE REGISTERED CONFIGS — uniform@bits=16
    // vs rank@bits=6, rank mode caps at bits=8 — measured first:
    // 50,245 uniform vs 56,316 rank decoded on a dense-region box
    // (2^16 equal-width buckets absorb a 125× tail ratio fine); the
    // outlier regime is where rank mode earns its keep, so that is
    // what this measures.
    // ----- string rank clustering at the GATE EDGES (r14 verdict #5) --
    // rankQuants' codegen-limit reasoning (bits ≤ 8, ≤ 65,536 distinct
    // keys) was argued, not measured — this measures it at the edges:
    // bits=8 pins the MAXIMUM 255 boundary strings (a 255-node string
    // when-tree, depth 8, per row per dimension) and the synthetic key
    // carries ~60,000 distinct values, just under the 65,536 refusal
    // gate (the boundary pass collects every distinct key). Reported:
    // the boundary+write wall (codegen compile + stats + shuffle), the
    // marker payload size (every boundary string rides it), the append
    // wall through the SAME pinned tree, and the scan decode on a
    // key-range box (the pruning the tree buys). A failure mode this
    // would catch: a when-tree past the JIT method limit silently
    // deoptimizes to interpreted evaluation — the write/append wall
    // would blow up, not the correctness.
    val ek = e.withColumn("skey",
      format_string("k%05d", col("event_id") % 60000))
    val strDir = s"$tmp/strgate"
    val w0 = System.nanoTime()
    Zorder.writeHilbertByRank(ek.filter(col("event_id") % 10 =!= 0),
      strDir, Seq("user_id", "skey"), bits = 8, numFiles = files)
    val writeS = (System.nanoTime() - w0) / 1e9
    val markerBytes = graft.operators.Layout
      .readMarker(spark, strDir, Zorder.markerFile).get.length
    val boundaries = Zorder.clusteringOf(spark, strDir).get
      .cols.find(_.name == "skey").get.sparams.length
    val a0 = System.nanoTime()
    Zorder.appendClustered(ek.filter(col("event_id") % 10 === 0),
      strDir, batchId = 1)
    val appendS = (System.nanoTime() - a0) / 1e9
    val s0 = System.nanoTime()
    val (mStr, dStr) = decoded(Zorder.readClustered(spark, strDir)
      .filter(col("user_id").between(300, 899) &&
        col("skey") >= lit("k10000") && col("skey") < lit("k20000")))
    val scanS = (System.nanoTime() - s0) / 1e9
    println(f"ZORDERPROBE strgate bits=8 boundaries=$boundaries " +
      f"markerBytes=$markerBytes writeS=$writeS%.2f appendS=$appendS%.2f " +
      f"scanS=$scanS%.2f matching=$mStr decodedRows=$dStr")
    // the 65,536-key REFUSAL fires loudly, with the remedy named —
    // guarded on the corpus actually CARRYING that many distinct ids
    // (at a small sf the write legitimately succeeds, and reporting
    // that as a bug would send the reader hunting a phantom)
    if (e.select(col("event_id")).distinct().count() > 65536) {
      val over = e.withColumn("skey",
        format_string("k%06d", col("event_id")))
      val gateMsg = try {
        Zorder.writeHilbertByRank(over, s"$tmp/strgate_over",
          Seq("user_id", "skey"), bits = 4, numFiles = files)
        "NO-REFUSAL (bug)"
      } catch { case e: IllegalArgumentException =>
        e.getMessage.take(60)
      }
      println(s"ZORDERPROBE strgate overGate='$gateMsg'")
    } else println("ZORDERPROBE strgate overGate=SKIPPED " +
      "(corpus has <= 65,536 distinct ids — the gate cannot fire here)")

    val eh = e.withColumn("heat",
      col("value") * col("value") *
        when(col("event_id") % 9973 === 0, lit(1e6)).otherwise(lit(1.0)))
    Zorder.writeZordered(eh, s"$tmp/zu", Seq("user_id", "heat"),
      bits = 16, numFiles = files)
    Zorder.writeZorderedByRank(eh, s"$tmp/zr", Seq("user_id", "heat"),
      bits = 6, numFiles = files)
    val heatPred = col("user_id").between(300, 899) &&
      col("heat") >= lit(100.0) && col("heat") < lit(400.0)
    Seq("zu" -> "zorderUniform", "zr" -> "zorderRank").foreach {
      case (d, label) =>
        val (matching, dec) =
          decoded(spark.read.parquet(s"$tmp/$d").filter(heatPred))
        println(s"ZORDERPROBE layout=$label box=outlierHeat " +
          s"matching=$matching decodedRows=$dec")
    }

    // ----- manifest scaling: commit bytes ∝ batch, planning ∝ match --
    // The r16 claims under measurement, at two table scales (×8 file
    // count): (a) the newest manifest file written per APPEND commit —
    // a DELTA — stays ~constant as the table grows (the r15 full-list
    // stamp grew with it; printed side by side with the base size a
    // full-list commit would pay); (b) the box overload's planned file
    // count tracks MATCHING files, not table files (kept/total falls
    // as the grid refines over the same box).
    def manifestSizes(dir: String): (Long, Long, Int, Int) = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fsx = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val fam = fsx.listStatus(root).filter { st =>
        val n = st.getPath.getName
        n.startsWith("_graft_manifest") && !n.contains(".tmp.")
      }
      val (deltas, bases) =
        fam.partition(_.getPath.getName.startsWith("_graft_manifestd."))
      (if (bases.isEmpty) 0L else bases.map(_.getLen).max,
        if (deltas.isEmpty) 0L
        else deltas.maxBy(_.getPath.getName.substring(17))(
          Ordering.String).getLen,
        bases.length, deltas.length)
    }
    Seq(32, 256).foreach { nf =>
      val dir = s"$tmp/mscale$nf"
      Zorder.writeZordered(e, dir, Seq("user_id", "ts"), bits = 16,
        numFiles = nf)
      var deltaBytes = Seq.empty[Long]
      (1 to 3).foreach { i =>
        Zorder.appendClustered(
          e.filter(col("event_id") % 100 === i), dir, batchId = i)
        deltaBytes :+= manifestSizes(dir)._2
      }
      val (baseBytes, _, _, _) = manifestSizes(dir)
      val box = Seq(("user_id", 2: Any, 8: Any),
        ("ts", java.time.Instant.parse("2024-01-10T00:00:00Z"): Any,
          java.time.Instant.parse("2024-01-15T00:00:00Z"): Any))
      val (kept, all) = Zorder.pruneFiles(spark, dir, box)
      println(s"ZORDERPROBE manifest files=$nf baseBytes=$baseBytes " +
        s"deltaBytesPerAppend=${deltaBytes.mkString(",")} " +
        s"plannedFiles=${kept.length} tableFiles=${all.length}")
    }

    // ----- merge scaling: rewrite ∝ touched files, not table files --
    // The q184 claim at two grid scales: a keyed CDC batch confined to
    // a user slice rewrites the files whose z-interval can hold that
    // slice — as the grid refines ×8 over the same data, the REWRITTEN
    // FRACTION for the same narrow batch falls (each file covers a
    // narrower z-span), which is exactly the shape a 100 TB CDC apply
    // needs: cost follows the change batch, not the table.
    def dataFiles(dir: String): Map[String, Long] = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fsx = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsx.listStatus(root).filter(st => !st.isDirectory &&
          !graft.operators.Layout.isHidden(st.getPath.getName))
        .map(st => st.getPath.getName -> st.getLen).toMap
    }
    val uMaxM = e.agg(max(col("user_id"))).collect()(0).getLong(0)
    Seq(32, 256).foreach { nf =>
      Seq(("user1", col("user_id") === 1),
          ("tenpct", col("user_id") <= math.max(1L, uMaxM / 10)))
        .foreach { case (label, pred) =>
          val dir = s"$tmp/mergescale-$nf-$label"
          Zorder.writeHilbert(e, dir, Seq("user_id", "ts"), bits = 16,
            numFiles = nf)
          val before = dataFiles(dir)
          Zorder.mergeClustered(spark, dir,
            e.filter(pred && col("event_id") % 2 === 0)
              .withColumn("value", col("value") + 1.0),
            Seq("event_id"))
          val after = dataFiles(dir)
          val rewritten = before.keySet -- after.keySet
          val totB = before.values.sum
          val rwB = rewritten.toSeq.map(before).sum
          println(f"ZORDERPROBE mergescale files=$nf batch=$label " +
            f"rewrittenFiles=${rewritten.size}/${before.size} " +
            f"rewrittenBytes=$rwB/$totB " +
            f"byteFrac=${rwB.toDouble / math.max(1L, totB)}%.4f")
        }
    }

    // ----- deletion vectors: read overhead ≈ nil, write ∝ batch -----
    // Two claims measured. (1) READ: an identical full-domain scan on
    // a layout carrying a committed tombstone set vs a DV-less twin —
    // the anti-join is a broadcast hash probe inside the scan stage,
    // so the median wall-time ratio should sit near 1 (the probe
    // prints both medians; the ratio is the number PLANS.md records).
    // (2) WRITE: the same single-user update batch applied via
    // mergeOnRead at two grid scales — bytes WRITTEN stay ∝ the batch
    // as the grid refines ×8 (and rewrittenFiles stays 0), where the
    // copy-on-write mergescale table above shows file-shaped bytes.
    locally {
      def scanMed(d: String): Double = {
        def once(): Double = {
          val t0 = System.nanoTime()
          Zorder.readClustered(spark, d)
            .agg(count(lit(1)), sum(col("value"))).collect()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm (footer cache, codegen)
        (1 to 5).map(_ => once()).sorted.apply(2)
      }
      // two scan sizes tell fixed cost (broadcast build + extra
      // stage) apart from per-row probe cost: if the absolute delta
      // stays flat as the scan grows ×8, the anti-join's per-row
      // share is negligible and the ratio on a REAL scan tends to 1
      Seq(1, 8).foreach { mult =>
        val src = if (mult == 1) e
          else e.withColumn("__rep",
            explode(lit((0 until 8).toArray))).drop("__rep")
        val plain = s"$tmp/dvprobe-plain-$mult"
        val dvd = s"$tmp/dvprobe-dv-$mult"
        Seq(plain, dvd).foreach(d => Zorder.writeHilbert(src, d,
          Seq("user_id", "ts"), bits = 16, numFiles = 32))
        val nDel = Zorder.deleteClustered(spark, dvd,
          e.filter(col("event_id") % 17 === 0)
            .select(col("event_id"), col("user_id"), col("ts")),
          Seq("event_id"))
        val mp = scanMed(plain)
        val md = scanMed(dvd)
        println(f"ZORDERPROBE dvread scanScale=$mult tomb=$nDel " +
          f"plainMed=$mp%.3fs dvMed=$md%.3fs ratio=${md / mp}%.3f " +
          f"deltaMs=${(md - mp) * 1000}%.0f")
      }
      // the common CDC shape: a KEY-LOCAL delete (one user) touches
      // few files, and every other file rides the clean branch with
      // zero per-row cost — the ratio should collapse toward 1
      // (contrast with the %17 delete above, which scatters
      // tombstones into every file by construction)
      val dvn = s"$tmp/dvprobe-narrow"
      Zorder.writeHilbert(e, dvn, Seq("user_id", "ts"), bits = 16,
        numFiles = 32)
      val nNarrow = Zorder.deleteClustered(spark, dvn,
        e.filter(col("user_id") === 1)
          .select(col("event_id"), col("user_id"), col("ts")),
        Seq("event_id"))
      val mn = scanMed(dvn)
      val mpRef = scanMed(s"$tmp/dvprobe-plain-1")
      println(f"ZORDERPROBE dvread narrow tomb=$nNarrow " +
        f"dvMed=$mn%.3fs plainMed=$mpRef%.3fs ratio=${mn / mpRef}%.3f")
      Seq(32, 256).foreach { nf =>
        val d = s"$tmp/morscale-$nf"
        Zorder.writeHilbert(e, d, Seq("user_id", "ts"), bits = 16,
          numFiles = nf)
        val before = dataFiles(d)
        Zorder.mergeOnRead(spark, d,
          e.filter(col("user_id") === 1 && col("event_id") % 2 === 0)
            .withColumn("value", col("value") + 1.0),
          Seq("event_id"), batchId = 2)
        val after = dataFiles(d)
        val rewritten = before.keySet -- after.keySet
        val written = after.collect {
          case (n, len) if !before.contains(n) => len }.sum
        println(f"ZORDERPROBE morscale files=$nf batch=user1 " +
          f"rewrittenFiles=${rewritten.size} writtenBytes=$written " +
          f"tableBytes=${before.values.sum}")
      }
    }
    spark.stop()
  }
}
