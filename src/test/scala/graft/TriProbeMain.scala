package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (not a test). */
object TriProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "20")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val s = dedup.Dedup.simhash(spark, d)
    s.count()
    val blocks = s.select(col("doc_id"), col("simhash"),
      explode(expr("transform(sequence(0, 9), b -> struct(b AS blk, shiftright(simhash, b*6) & 63 AS bval))")).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.blk").as("blk"), col("bk.bval").as("bval"))
    val cand = blocks.toDF("d1", "h1", "blk", "bval")
      .join(blocks.toDF("d2", "h2", "blk2", "bval2"),
        col("blk") === col("blk2") && col("bval") === col("bval2") && col("d1") < col("d2"))
    println("candidates: " + cand.count())
    val filt = cand.select(col("d1"), col("d2"),
      bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .where(col("hamming") <= 9)
    println("survivors (pre-distinct): " + filt.count())
    println("pairs: " + filt.distinct().count())
    for (i <- 1 to 3) time(s"pairs_rep$i")(
      dedup.Dedup.simhashPairs(spark, d).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
