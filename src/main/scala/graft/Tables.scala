package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Loaders for the driver-generated Parquet fixture tables (TESTDATA.md).
  *
  * The reference parses pipe-delimited `.tbl` text positionally at every use
  * site (e.g. `assignment5/Q1.scala:32` `r.split("\\|",12)(10)`); here the
  * schema lives in the Parquet footer and Catalyst prunes columns + pushes
  * filters into the scan automatically. At 100 TB these tables would be
  * bucketed/partitioned Parquet or an open table format; the access path
  * (spark.read.parquet + declarative plans) is identical.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  /** The events fixture stores ts as Parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos
    * as raw longs and rebuild a microsecond timestamp (integer div — the
    * values exceed 2^53, so double math would corrupt them).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("CAST(ts div 1000 AS BIGINT)")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `yyyy-MM-dd` rendering of a timestamp column — the reference compares
    * date *strings* (substring containment `Q1.scala:32`, lexicographic
    * range `Q7.scala:39,55`); rendering once preserves those semantics
    * exactly while the storage stays a real timestamp.
    */
  def dayStr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Reference date predicate: `shipdate.contains(dt)` where dt is a
    * `YYYY`, `YYYY-MM` or `YYYY-MM-DD` prefix (`Q1.scala:32`). On a
    * yyyy-MM-dd rendering, containment == prefix match.
    */
  def dateMatches(c: Column, dt: String): Column = dayStr(c).startsWith(dt)
}
