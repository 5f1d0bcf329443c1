package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
  */
object Bucketed {

  /** Persist `df` as a bucketed+sorted managed table (overwrites; also
    * clears a leftover location from a previous in-memory catalog, which
    * saveAsTable refuses to overwrite for an unregistered table).
    */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bucket the lineitem/orders pair by orderkey for exchange-free joins. */
  def bucketizeFacts(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    write(graft.Tables.lineitem(spark, dir), "lineitem_b", "l_orderkey", buckets)
    write(graft.Tables.orders(spark, dir), "orders_b", "o_orderkey", buckets)
  }

  /** The q4-shaped fact join over the bucketed tables: same result, no
    * exchange on either join input (asserted in BucketedSpec).
    */
  def coLocatedJoin(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.table("lineitem_b").select(col("l_orderkey"))
      .join(spark.table("orders_b").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
  }
}
