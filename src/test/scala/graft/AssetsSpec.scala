package graft

import org.apache.spark.sql.functions._
import graft.assets.{Asset, AssetRegistry, AssetWatcher, Cond}

/** Asset registry, event log, aliases, boolean trigger conditions
  * (SURVEY.md §2.9 T2–T6, §2.1 S12). */
class AssetsSpec extends SparkSpec {

  private def freshRegistry(): AssetRegistry = {
    val dir = java.nio.file.Files.createTempDirectory("graft_assets_").toString
    new AssetRegistry(spark, dir)
  }

  test("producer writes asset + event; consumer reads both (E3 round-trip)") {
    val reg = freshRegistry()
    val tmp = java.nio.file.Files.createTempDirectory("graft_asset_data_").toString
    reg.register(Asset("dag1_out", s"$tmp/output_1", Map("hi" -> "bye")))
    val df = graft.sources.Tables.load(spark, sfDir, "nation")
    reg.writeAsset(df, "dag1_out", Map("rows" -> df.count().toString))
    assert(reg.readAsset("dag1_out").count() == df.count())
    val ev = reg.events(Some("dag1_out")).collect()
    assert(ev.length == 1)
    assert(reg.lastEventExtra("dag1_out").get("rows") == df.count().toString)
  }

  test("event log slicing: last event wins, ordered by seq (T5)") {
    val reg = freshRegistry()
    val tmp = java.nio.file.Files.createTempDirectory("graft_asset_data_").toString
    reg.register(Asset("a", s"$tmp/a"))
    (1 to 3).foreach(i => reg.recordEvent("a", Map("i" -> i.toString)))
    val seqs = reg.events(Some("a")).select("seq").collect().map(_.getLong(0))
    assert(seqs.sorted.sameElements(seqs) && seqs.length == 3)
    assert(reg.lastEventExtra("a").get("i") == "3")
  }

  test("alias resolution is late-bound (T6)") {
    val reg = freshRegistry()
    val tmp = java.nio.file.Files.createTempDirectory("graft_asset_data_").toString
    reg.register(Asset("v1", s"$tmp/v1"))
    reg.register(Asset("v2", s"$tmp/v2"))
    reg.alias("current", "v1")
    assert(reg.resolve("current").name == "v1")
    reg.alias("current", "v2")
    assert(reg.resolve("current").name == "v2")
    intercept[IllegalArgumentException](reg.alias("bad", "nope"))
  }

  test("boolean conditions: d1 & d2, d1 | (d2 & d3) (T3)") {
    val c1 = Cond.On("d1") & Cond.On("d2")
    assert(!c1.eval(Set("d1")))
    assert(c1.eval(Set("d1", "d2")))
    val c2 = Cond.On("d1") | (Cond.On("d2") & Cond.On("d3"))
    assert(c2.eval(Set("d1")))
    assert(!c2.eval(Set("d2")))
    assert(c2.eval(Set("d2", "d3")))
  }

  test("watcher fires only when the condition holds, then checkpoints (T2/T4)") {
    val reg = freshRegistry()
    val tmp = java.nio.file.Files.createTempDirectory("graft_asset_data_").toString
    reg.register(Asset("x", s"$tmp/x")); reg.register(Asset("y", s"$tmp/y"))
    val w = new AssetWatcher(reg, Cond.On("x") & Cond.On("y"))
    assert(w.poll().isEmpty)            // nothing yet
    reg.recordEvent("x")
    assert(w.poll().isEmpty)            // only x
    reg.recordEvent("y")
    assert(w.poll().contains(Set("x", "y")))
    assert(w.poll().isEmpty)            // checkpoint advanced, no new events
    reg.recordEvent("x")
    assert(w.poll().isEmpty)            // x alone doesn't satisfy AND again
  }
}
