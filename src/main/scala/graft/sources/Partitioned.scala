package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned sink + partition-pruned scan — alongside
  * bucketing ([[Bucketed]]) and Z-ordering (operators/Layout), the third
  * storage-layout lever and the FIRST one every 100 TB pipeline reaches
  * for: fact tables land `partitionBy(day)`, so a day-scoped query lists
  * one directory instead of scanning the corpus. Pruning happens at file
  * LISTING time (the `day` values never leave the directory names), which
  * is strictly stronger than row-group min/max skipping — a 3-year
  * corpus answers a one-day query by reading 1/1000th of the files.
  *
  * The registry query `op_partition_prune` gates the round trip: events
  * written day-partitioned under the per-JVM artifact root (once per
  * session, a ledgered `build:*` row), reopened with a FRESH
  * `spark.read.parquet` — like [[Bucketed]], the scan must not pass
  * through the memo's lineage truncation or the partition columns would
  * collapse into a LogicalRDD leaf and the pruning with them — then a
  * one-day rollup hash-gated against the oracle's direct filter over the
  * raw table. PlanAuditSpec asserts the day predicate lands in
  * `PartitionFilters` (not a post-scan Filter).
  */
object Partitioned {

  private def path(dir: String): String =
    new org.apache.hadoop.fs.Path(
      graft.Caches.artifactBase(dir).toString, "events_by_day").toString

  /** Once-per-session partitioned write, ledgered via the memo observer
    * (the memoized frame is only a 1-row marker).
    */
  private def ensureWritten(spark: SparkSession, dir: String): Unit =
    graft.Caches.memoized(spark, dir, "sources:events_by_day") {
      graft.Tables.events(spark, dir)
        .withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day").parquet(path(dir))
      spark.range(1).toDF("built")
    }

  /** Fresh scan over the partitioned files: `day` is a directory-derived
    * partition column (DateType by inference), so predicates on it prune
    * at listing time.
    */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame = {
    ensureWritten(spark, dir)
    spark.read.parquet(path(dir))
  }

  /** One-day rollup over the partitioned layout — the plan reads exactly
    * one day directory (PartitionFilters carry the predicate).
    */
  def prunedDayRollup(spark: SparkSession, dir: String,
                      day: String = "2024-01-15"): DataFrame =
    readPartitioned(spark, dir)
      .where(col("day") === to_date(lit(day)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(12,2)")), 2)
          .cast("double").as("sum_value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_partition_prune" -> ((s, d) => prunedDayRollup(s, d))
  )

  val oracles: Map[String, String] = Map(
    "op_partition_prune" ->
      """SELECT event_type, count(*) AS n,
               CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
         FROM events
         WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) = DATE '2024-01-15'
         GROUP BY event_type"""
  )
}
