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
