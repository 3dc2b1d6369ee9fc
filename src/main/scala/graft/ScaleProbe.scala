package graft

import org.apache.spark.sql.functions._
import graft.operators.Components

/** Scale probe for the iterative operators (PLANS.md "10× probe"):
  * builds deterministic synthetic edge sets far larger than the test
  * corpus produces and records [[Components.connectedComponents]]'s
  * convergence rounds + wall time, pinning the O(log n) round claim
  * with data instead of prose.
  *
  * Graph shape per size n (all arithmetic-deterministic, no RNG):
  *   - chains of length n/10 — diameter grows LINEARLY with n, the
  *     adversarial case separating large/small-star (log rounds) from
  *     naive min-propagation (diameter rounds);
  *   - a hub: node 0 adjacent to every 97th node (high-degree skew —
  *     must stay a partial-agg cell, never a neighbor array);
  *   - pseudo-random chords from a Knuth-hash of the id (cross links
  *     so components merge across chains).
  *
  * Usage: `runMain graft.ScaleProbe 5000 50000 500000` — or
  * `runMain graft.ScaleProbe chain 5000 …` for ONE chain of length n
  * with no hub/chords (diameter = n exactly: the pure worst case that
  * naive propagation would need n rounds for). One line per size:
  * n, edges, components, rounds, seconds.
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val chainOnly = args.headOption.contains("chain")
    val sizeArgs = if (chainOnly) args.tail else args
    val sizes = if (sizeArgs.nonEmpty) sizeArgs.map(_.toLong).toSeq
                else Seq(5000L, 50000L, 500000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.builder("graft-scaleprobe", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sizes.foreach { n =>
      val chainLen = if (chainOnly) n else math.max(1000L, n / 10L)
      val ids = spark.range(n)
      val chain = ids
        .filter(col("id") % chainLen =!= (chainLen - 1) && col("id") < n - 1)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val edges =
        if (chainOnly) chain
        else {
          val hub = ids.filter(col("id") % 97 === 3)
            .select(lit(0L).as("a"), col("id").as("b"))
          val chords = ids.filter(col("id") % 13 === 5)
            .select(col("id").as("a"), pmod(col("id") * 2654435761L, lit(n)).as("b"))
          chain.union(hub).union(chords)
        }
      val nEdges = edges.count()

      val t0 = System.nanoTime()
      val (comp, rounds) = Components.connectedComponentsCounted(edges)
      val nComp = comp.select(countDistinct(col("component"))).head().getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE n=$n edges=$nEdges components=$nComp rounds=$rounds time=$secs%.2f s")
    }
    spark.stop()
  }
}
