package graft

import java.nio.file.{Files, Paths}

import graft.operators.Layout
import graft.sources.Sinks

/** Pins the populated-layout probe ([[Sinks.hasDataFiles]]) and its
  * load-bearing consumer, [[Layout.bootstrapOrGuard]]'s refuse-unmarked-
  * data arm. The probe's definition of "data" must be exactly what a
  * parquet reader of the layout sees: any non-hidden file outside
  * hidden directories — NOT a `part-*` name allowlist, because
  * [[Layout.idempotentAppend]] publishes batch files under a `b<id>-`
  * prefix, and a probe blind to them once reported a populated layout
  * as empty (letting a mismatched config re-stamp the marker over live
  * rows).
  */
class LayoutSpec extends SparkSpec {

  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft_layout_${tag}_").toString

  private def touch(dir: String, rel: String): Unit = {
    val p = Paths.get(dir, rel)
    Files.createDirectories(p.getParent)
    Files.write(p, Array[Byte](1))
  }

  test("hasDataFiles: metadata and staged files are not data") {
    val dir = tmp("meta")
    assert(!Sinks.hasDataFiles(spark, dir), "empty layout")
    touch(dir, "_SUCCESS")
    touch(dir, "_graft_centroids")
    touch(dir, ".part-00000.parquet.crc")
    assert(!Sinks.hasDataFiles(spark, dir),
      "markers, _SUCCESS and .crc sidecars are metadata, not rows")
    // in-flight staged batch: invisible to readers, must not count
    touch(dir, "_graft_staging/7/cluster=0/part-00000.parquet")
    touch(dir, "_graft_batches/3")
    assert(!Sinks.hasDataFiles(spark, dir),
      "files under hidden dirs are invisible to layout readers")
  }

  test("hasDataFiles: plain and batch-published files are data") {
    val plain = tmp("plain")
    touch(plain, "part-00000.parquet")
    assert(Sinks.hasDataFiles(spark, plain))
    // the regression: idempotentAppend publishes under a b<id>- prefix
    // inside partition dirs — a part-* allowlist misses these
    val batched = tmp("batched")
    touch(batched, "term_bucket=3/b7-part-00000.parquet")
    assert(Sinks.hasDataFiles(spark, batched),
      "batch-prefixed files in partition dirs are live rows")
  }

  test("writer lease: concurrent distinct-config bootstrap-appends — one wins, one throws") {
    // the race the lease exists for: two writers bootstrap-append onto
    // the SAME fresh path with DIFFERENT configs (nBuckets 8 vs 16).
    // The composite holds ONE lease across bootstrap + publish, so
    // whatever the interleaving, exactly one wins: truly concurrent →
    // the loser fails lease acquisition (IllegalStateException);
    // serialized by scheduling → the loser hits the winner's marker
    // over populated data (IllegalArgumentException). Both-succeed —
    // data of two bucket functions under one certificate — must be
    // impossible. Repeated rounds, fresh path each, so a scheduling
    // accident cannot hide a regression forever.
    val s = spark
    import s.implicits._
    import graft.operators.Postings
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      for (round <- 0 until 8) {
        val dir = tmp(s"race$round") + "/idx"
        val posts = Postings.build(
          Seq(1L -> "to be or not to be").toDF("doc_id", "text"),
          "doc_id", "text")
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        def attempt(nBuckets: Int) =
          pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
            def call(): Option[Throwable] = {
              barrier.await()
              try { Postings.appendIndexBatch(posts, dir, 0L, nBuckets); None }
              catch { case e: Throwable => Some(e) }
            }
          })
        // submit BOTH before getting either — the barrier needs two
        // in-flight parties, and get() blocks the test thread
        val (fa, fb) = (attempt(8), attempt(16))
        val (ra, rb) = (fa.get(), fb.get())
        val stored = Layout.readMarker(spark, dir, "_graft_nbuckets")
        (ra, rb) match {
          case (None, None) =>
            fail(s"round $round: both configs claimed success — marker " +
              s"'${stored.getOrElse("?")}' certifies only one bucket " +
              "function over mixed rows")
          case (None, Some(e)) =>
            assert(stored.contains("8"), s"winner 8 yet marker '$stored'")
            assert(e.isInstanceOf[IllegalStateException] ||
              e.isInstanceOf[IllegalArgumentException],
              s"loser must throw the protocol's errors, threw $e")
          case (Some(e), None) =>
            assert(stored.contains("16"), s"winner 16 yet marker '$stored'")
            assert(e.isInstanceOf[IllegalStateException] ||
              e.isInstanceOf[IllegalArgumentException],
              s"loser must throw the protocol's errors, threw $e")
          case (Some(ea), Some(eb)) =>
            fail(s"round $round: both writers failed ($ea / $eb)")
        }
        // no dangling lease either way
        assert(Layout.readMarker(spark, dir, "_graft_lease").isEmpty,
          "lease must be released after the composite")
      }
    } finally pool.shutdown()
  }

  test("writer lease: reentrant within a thread, stale leases expire, live ones block") {
    val dir = tmp("lease")
    // reentrant: a composite holding the lease can call leased steps
    val v = Layout.withWriterLease(spark, dir, "outer") {
      Layout.withWriterLease(spark, dir, "inner") { 42 }
    }
    assert(v == 42)
    // the lease is RELEASED after the block: a fresh acquire works
    assert(Layout.withWriterLease(spark, dir, "again") { 7 } == 7)
    // a live foreign lease blocks loudly
    touch(dir, "_graft_lease")
    val e = intercept[IllegalStateException](
      Layout.withWriterLease(spark, dir, "blocked") { () })
    assert(e.getMessage.contains("single-writer"))
    // an EXPIRED foreign lease is broken and acquisition succeeds
    spark.conf.set("spark.graft.layout.lease.ttlMs", "1")
    try {
      Thread.sleep(5)
      assert(Layout.withWriterLease(spark, dir, "expired") { 9 } == 9)
    } finally spark.conf.unset("spark.graft.layout.lease.ttlMs")
  }

  test("writer lease: two breakers of one stale lease — at most one proceeds") {
    // the stale-break race: delete-then-create would let BOTH breakers
    // through (B's delete removes A's fresh lease); rename-aside is
    // exclusive, so exactly one wins each round. Both-succeed is the
    // bug; both-fail is impossible (the rename winner proceeds).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      for (round <- 0 until 10) {
        val dir = tmp(s"brk$round")
        touch(dir, "_graft_lease")
        // age the foreign lease PAST the TTL by mtime, keeping the TTL
        // itself comfortably above the body duration — a tiny TTL
        // would let the loser legitimately TTL-break the winner's
        // FRESH lease mid-body (documented overrun behavior, not the
        // race under test)
        val lp = new org.apache.hadoop.fs.Path(dir, "_graft_lease")
        val lfs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        lfs.setTimes(lp, System.currentTimeMillis() - 60000, -1)
        spark.conf.set("spark.graft.layout.lease.ttlMs", "30000")
        try {
          val gate = new java.util.concurrent.CyclicBarrier(2)
          val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
          val peak = new java.util.concurrent.atomic.AtomicInteger(0)
          def attempt() = pool.submit(
            new java.util.concurrent.Callable[Boolean] {
              def call(): Boolean = {
                gate.await()
                try {
                  Layout.withWriterLease(spark, dir, "race") {
                    val now = inBody.incrementAndGet()
                    peak.updateAndGet(p => math.max(p, now))
                    Thread.sleep(20)
                    inBody.decrementAndGet()
                    true
                  }
                } catch { case _: IllegalStateException => false }
              }
            })
          val (fa, fb) = (attempt(), attempt())
          val (ra, rb) = (fa.get(), fb.get())
          assert(ra || rb, s"round $round: the rename winner must proceed")
          assert(peak.get() <= 1,
            s"round $round: both breakers ran the body CONCURRENTLY — " +
              "the delete-then-create interleaving is back")
        } finally spark.conf.unset("spark.graft.layout.lease.ttlMs")
      }
    } finally pool.shutdown()
  }

  test("writer lease: release verifies ownership on the renamed copy; foreign leases survive") {
    // clean release: no lease, no released-tombstone debris
    val dir = tmp("rel")
    Layout.withWriterLease(spark, dir, "clean") { () }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val left = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("_graft_lease"))
    assert(left.isEmpty, s"release left lease debris: ${left.mkString(",")}")
    // a lease REPLACED mid-body (a TTL-breaker evicted an overrun
    // holder) is not ours to release: the pre-read ownership check
    // sees a foreign owner and never touches it — the breaker's live
    // lease is not even transiently renamed aside (the old handback
    // path opened a steal window on every overrun release); deleting
    // or stealing it would let a third writer run concurrently
    Layout.withWriterLease(spark, dir, "overrun") {
      Layout.writeMarker(spark, dir, "_graft_lease", "foreign-breaker")
    }
    assert(Layout.readMarker(spark, dir, "_graft_lease")
      .contains("foreign-breaker"),
      "a foreign (breaker's) lease must survive our release untouched")
    val tombs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("_graft_lease."))
    assert(tombs.isEmpty, s"handback left tombstones: ${tombs.mkString(",")}")
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_graft_lease"), false)
  }

  test("writer lease: dead broken/released tombstones are GC'd on contention") {
    // a breaker that crashed between rename-aside and delete leaves
    // _graft_lease.broken.<uuid> that nothing else sweeps — the next
    // CONTENDED acquisition (the only path that can create more of
    // them) deletes any older than the TTL; fresh ones are kept (their
    // holder may still be mid-handback)
    val dir = tmp("gc")
    touch(dir, "_graft_lease.broken.deadbeef")
    touch(dir, "_graft_lease.released.cafebabe")
    touch(dir, "_graft_lease.broken.fresh01")
    touch(dir, "_graft_lease") // stale live lease → forces contention
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def age(name: String): Unit = fs.setTimes(
      new org.apache.hadoop.fs.Path(dir, name),
      System.currentTimeMillis() - 60000, -1)
    age("_graft_lease.broken.deadbeef")
    age("_graft_lease.released.cafebabe")
    age("_graft_lease")
    spark.conf.set("spark.graft.layout.lease.ttlMs", "30000")
    try assert(Layout.withWriterLease(spark, dir, "gc") { 1 } == 1)
    finally spark.conf.unset("spark.graft.layout.lease.ttlMs")
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSet
    assert(!names.contains("_graft_lease.broken.deadbeef") &&
      !names.contains("_graft_lease.released.cafebabe"),
      s"dead tombstones must be GC'd, left: ${names.mkString(",")}")
    assert(names.contains("_graft_lease.broken.fresh01"),
      "a tombstone younger than the TTL must be kept")
  }

  test("bootstrapOrGuard refuses to stamp over batch-published unmarked data") {
    // the exact crash shape the probe fix exists for: a layout whose
    // ONLY rows came through idempotentAppend (b<id>- names), whose
    // marker a crashed rebuild then cleared — stamping a fresh marker
    // here would certify rows of unknown organization
    val dir = tmp("guard")
    touch(dir, "term_bucket=0/b2-part-00000.parquet")
    val e = intercept[IllegalArgumentException](
      Layout.bootstrapOrGuard(spark, dir, "_graft_nbuckets", "64",
        what = "test", mismatch = s => s"mismatch $s"))
    assert(e.getMessage.contains("no _graft_nbuckets marker"))
    // same layout, dead mismatched marker over EMPTY data set would
    // re-stamp — but over populated data a mismatch must fail fast
    Layout.writeMarker(spark, dir, "_graft_nbuckets", "32")
    val e2 = intercept[IllegalArgumentException](
      Layout.bootstrapOrGuard(spark, dir, "_graft_nbuckets", "64",
        what = "test", mismatch = s => s"mismatch $s"))
    assert(e2.getMessage.contains("mismatch 32"))
  }
}
