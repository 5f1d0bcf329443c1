package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf profiler for the heavy pairwise queries (not a test; run
  * with `sbt "Test/runMain graft.ProfileMain"`).
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val sh = Tables.documents(spark, d)
      .select(col("doc_id"), dedup.Dedup.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    time("explode")(ex.count())
    val inter = ex.toDF("d1", "s").join(ex.toDF("d2", "s2"), col("s") === col("s2"))
      .where(col("d1") < col("d2")).groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
    time("inter-join")(inter.count())
    time("full-jaccard")(dedup.Dedup.ngramJaccardPairs(spark, d).count())
    val e = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    time("emb-count")(e.count())
    val dots = e.toDF("v1", "e1").join(e.toDF("v2", "e2"), col("v1") < col("v2"))
      .select(sim.Similarity.dot(col("e1"), col("e2")).as("x"))
    time("pair-dot-only")(dots.filter(col("x") > -1e18).count())
    time("full-cosine")(sim.Similarity.cosinePairs(spark, d).count())
    val sig = sh.select(col("doc_id"), dedup.Dedup.minhashSignature(col("sh")).as("sig"))
    time("minhash-sig")(sig.filter(size(col("sig")) === 64).count())
    time("full-minhash")(dedup.Dedup.minhashPairs(spark, d).count())
    time("simhash")(dedup.Dedup.simhash(spark, d).count())
    time("simhash-pairs")(dedup.Dedup.simhashPairs(spark, d).count())
    spark.stop()
  }
}
