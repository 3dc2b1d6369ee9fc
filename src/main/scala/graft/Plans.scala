package graft

/** Diagnostic main: dump the formatted physical plan of every declared
  * query to `outDir/<name>.txt`. Used for the per-round plan audit —
  * grep for `PushedFilters`, `ReadSchema`, `BroadcastHashJoin`,
  * `WholeStageCodegen` spans, and unexpected `Exchange`s.
  *
  * Usage: runMain graft.Plans <sfDir> <outDir>
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Session.builder("graft-plans", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name.txt"),
          plan.getBytes("UTF-8"))
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
