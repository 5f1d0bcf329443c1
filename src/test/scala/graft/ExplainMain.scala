package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for registered queries (not a
  * test; run with `sbt "Test/runMain graft.ExplainMain <out_dir> <q1,q2,...>
  * [sfDir]"`). Writes one `<out_dir>/<name>.txt` per query — the plan
  * evidence files committed under plans/r14/ for the optimization round.
  * Session config mirrors [[Bench]] so the captured plan is the planned
  * shape of the benched query (AQE re-optimized runtime plans differ; the
  * formatted explain is the pre-execution contract the round documents).
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val names =
      if (args.length > 1 && args(1) != "all") args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"$n.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"EXPLAINED $n -> ${outDir.resolve(s"$n.txt")}")
    }
    Caches.releaseAll()
    spark.stop()
  }
}
