package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for registered queries.
  * `runMain graft.PlanDump <outDir> <q1,q2,...> [sfDir]` — writes
  * `<outDir>/<query>.txt` per query (the plans/r14 evidence files).
  * Memo builds ARE materialized first (Caches.memoized runs its build on
  * first touch), so the dumped plan is the steady-state per-rep plan the
  * bench times — the same frame a timed rep materializes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PLAN $name -> $outDir/$name.txt")
    }
    Caches.releaseAll()
    spark.stop()
  }
}
