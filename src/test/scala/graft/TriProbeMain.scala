package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc plan/timing probe for pr_triangles_10k (not a test; run with
  * `sbt "Test/runMain graft.TriProbeMain"`).
  */
object TriProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "20")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm builds
    noop(graph.PageRank.triangles(spark, d, 10000))
    val und = graft.Caches.memoized(spark, d, "graph:und_10000")(sys.error("built"))
    def perNode: DataFrame = {
      val tri = und.toDF("a", "b")
        .join(broadcast(und.toDF("b2", "c")), col("b") === col("b2"))
        .join(broadcast(und.toDF("a3", "c3")),
          col("a") === col("a3") && col("c") === col("c3"))
        .select(col("a"), col("b"), col("c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    }
    for (i <- 1 to 3) {
      time(s"full_$i")(noop(graph.PageRank.triangles(spark, d, 10000)))
      time(s"pernode_$i")(noop(perNode))
      time(s"bcast_only_$i")(noop(und.toDF("a", "b")
        .join(broadcast(und.toDF("b2", "c")), col("b") === col("b2"))
        .select(lit(1).as("x"))))
      time(s"nodes_$i")(noop(graph.PageRank.nodes(spark, d, 10000)))
      time(s"plan_only_$i") {
        graph.PageRank.triangles(spark, d, 10000).queryExecution.executedPlan
      }
      time(s"nodesjoin_$i")(noop(
        graph.PageRank.nodes(spark, d, 10000).join(perNode, Seq("id"), "left")
          .select(col("id"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))))
    }
    spark.stop()
  }
}
