package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table support — the persisted form of co-located joins
  * (SURVEY §4 "co-partitioning preserved across iterations"; the
  * reference approximates it with non-splittable inputs + fixed reducer
  * counts, `NonSplitableSequenceFileInputFormat.java:7-11`).
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key lets every future join plan as a zero-exchange sort-merge
  * join: at 100 TB that removes the dominant shuffle of every
  * fact-to-fact join that reuses the key. Bucket counts must match (or
  * divide) across tables; `spark.sql.sources.bucketing.enabled` is on by
  * default.
  *
  * The registry query `op_bucketed_join` hash-gates the claim end to
  * end: build both bucketed tables once per session (a ledgered
  * `build:*` artifact, external-location Parquet under the per-JVM
  * artifact root so no `spark-warehouse` leaks into the cwd), run the
  * q4-shaped fact join over fresh table scans — the scans must stay
  * catalog-rooted, NOT memo-truncated, because the bucket spec lives on
  * the catalog relation and is what lets the planner drop both
  * exchanges — and compare against the oracle's plain shuffled join.
  * The zero-exchange plan property is asserted in BucketedSpec and in
  * PlanAuditSpec's registry lint.
  */
object Bucketed {

  /** Short fixture-dir fingerprint so tables from different dirs never
    * collide in one session's catalog (specs and mains share a JVM).
    */
  private def suffix(dir: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(dir.getBytes)
      .take(4).map("%02x".format(_)).mkString

  private[graft] def liTable(dir: String) = s"lineitem_b_${suffix(dir)}"
  private[graft] def ordTable(dir: String) = s"orders_b_${suffix(dir)}"

  /** Persist `df` as a bucketed+sorted EXTERNAL table rooted under the
    * per-JVM artifact base (overwrites; also clears a leftover location
    * from a previous in-memory catalog, which saveAsTable refuses to
    * overwrite for an unregistered table).
    */
  def write(df: DataFrame, dir: String, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      graft.Caches.artifactBase(dir).toString, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", loc.toString)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bucket the lineitem/orders pair by orderkey for exchange-free joins.
    * Each side is PROJECTED to the columns the co-located join family
    * reads before bucketing: the bucket/sort mechanics the gate proves
    * (spec survives the catalog, both exchanges dropped) are per-file
    * metadata and identical at any width, while writing all 16 lineitem
    * columns made this the single largest build row (~16 s of a 152 s
    * contended ledger) for bytes no query ever scanned. At 100 TB the
    * same choice holds: you bucket the join-relevant projection you
    * serve, not the full fact table, when the join workload is known.
    */
  def bucketizeFacts(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    write(graft.Tables.lineitem(spark, dir).select(col("l_orderkey")),
      dir, liTable(dir), "l_orderkey", buckets)
    write(graft.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey")),
      dir, ordTable(dir), "o_orderkey", buckets)
  }

  /** The q4-shaped fact join over the bucketed tables: same result, no
    * exchange on either join input (asserted in BucketedSpec).
    */
  def coLocatedJoin(spark: SparkSession, dir: String): DataFrame =
    spark.table(liTable(dir)).select(col("l_orderkey"))
      .join(spark.table(ordTable(dir)).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))

  /** Registry entry: once-per-session bucketize (ledgered via the memo's
    * build observer — the memoized frame is only a 1-row marker; the
    * QUERY reads fresh catalog scans so the bucket spec survives).
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.Caches.memoized(spark, dir, "sources:bucketed_facts") {
      bucketizeFacts(spark, dir, buckets = 8)
      spark.range(1).toDF("built")
    }
    coLocatedJoin(spark, dir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_bucketed_join" -> ((s, d) => bucketedJoin(s, d))
  )

  val oracles: Map[String, String] = Map(
    "op_bucketed_join" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_custkey"""
  )
}
