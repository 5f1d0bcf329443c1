package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query at local[N] and prints ONE
  * JSON line. Each query is materialized through the `noop` sink — a real
  * write of every row/column the plan produces — so Catalyst cannot prune
  * the measured work down to a row count (a bare `count()` would let it
  * drop every per-row transform). Failures are NOT recorded as fast times:
  * a failed query reports its elapsed time AND an entry in `"errors"`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS); session-build opt-in (no
      // per-read option exists) so the library never mutates confs mid-run
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Option[String] =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable =>
        Some((Option(e.getMessage).getOrElse(e.getClass.getName)).take(300))
      }

    // Warm the session (codegen infra, vectorized parquet reader, JIT)
    // so the first measured query isn't charged for JVM startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    materialize(SparkEntry.queries.head._1)

    val results = SparkEntry.queries.keys.toSeq.map { name =>
      val t0 = System.nanoTime()
      val err = materialize(name)
      (name, (System.nanoTime() - t0) / 1e9, err)
    }

    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v, _) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${q(k)}:${q(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    Caches.releaseAll()
    spark.stop()
  }
}
