package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-order (Morton) multidimensional clustering — the data-layout lever
  * behind file skipping at 100 TB: a scan prunes a file iff the file's
  * min/max envelope misses the predicate, so clustering decides how many
  * files a 1-D or 2-D box query must touch. A single-dimension sort is
  * perfect on its own axis and catastrophic on the other; interleaving
  * the dimensions' bits gives a single sort key that keeps BOTH axes
  * locality, the standard Delta/Iceberg OPTIMIZE ZORDER technique
  * (Morton 1966; Bayer's UB-tree line of work).
  *
  * The operator MEASURES that claim instead of asserting it: events are
  * bucketed into 64 equal-width "files" under three layouts — day-major
  * (d⟨5b⟩∥h⟨5b⟩ ≫ 4), hour-major (h∥d ≫ 4), and Z (bit-interleave ≫ 4) —
  * and two box queries (a day range crossing all hours; an hour band
  * crossing all days) count the distinct buckets holding at least one
  * matching row: exactly the files a min/max-pruned scan must read.
  * Every number is pure integer arithmetic over the event timestamps, so
  * the whole comparison hash-gates against the SQL oracle (no pinned
  * booleans — the measured counts themselves are deterministic).
  * Expected shape (dense fixture): Z lands near the per-axis optimum on
  * BOTH queries while each major layout degrades ~bucket-count-wide on
  * its off axis.
  */
object Layout {

  private val Bits = 5 // day-of-month and hour-of-day both fit 5 bits

  /** Morton interleave of two [[Bits]]-bit columns: a's bit i lands at
    * 2i+1, b's at 2i (a = day gets the higher lanes).
    */
  def zInterleave(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i))
    }.reduce(_.bitwiseOR(_))

  /** One-row layout comparison (see object doc): match counts for the
    * two box queries plus buckets-touched per (query × layout).
    */
  def zorderPruning(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      (dayofmonth(col("ts")) - 1).as("d"), // 0..30
      hour(col("ts")).as("h"))             // 0..23
    val bucketed = ev.select(
      col("d"), col("h"),
      shiftright(shiftleft(col("d"), Bits).bitwiseOR(col("h")), 4).as("b_day"),
      shiftright(shiftleft(col("h"), Bits).bitwiseOR(col("d")), 4).as("b_hour"),
      shiftright(zInterleave(col("d"), col("h")), 4).as("b_z"))
    val qa = col("d").between(10, 19) // day range, all hours
    val qb = col("h").between(8, 11)  // hour band, all days
    bucketed.agg(
      sum(when(qa, 1L).otherwise(0L)).as("n_a"),
      sum(when(qb, 1L).otherwise(0L)).as("n_b"),
      count_distinct(when(qa, col("b_day"))).as("a_day"),
      count_distinct(when(qa, col("b_hour"))).as("a_hour"),
      count_distinct(when(qa, col("b_z"))).as("a_z"),
      count_distinct(when(qb, col("b_day"))).as("b_day"),
      count_distinct(when(qb, col("b_hour"))).as("b_hour"),
      count_distinct(when(qb, col("b_z"))).as("b_z"))
  }

  private def zSql(a: String, b: String): String =
    (0 until Bits).map { i =>
      s"(((($a >> $i) & 1) << ${2 * i + 1}) | ((($b >> $i) & 1) << ${2 * i}))"
    }.mkString("(", " | ", ")")

  /** The three layouts WRITTEN as real Parquet — one file per
    * (layout, file_id), rows clustered inside each file by
    * `sortWithinPartitions(d, h)` — the write-side half of the z-order
    * lever (r12 verdict task 8: the bucket model above predicts
    * pruning; this artifact lets it be measured from bytes on disk).
    * `repartition(layout, f)` then `partitionBy(layout, f)` yields
    * exactly one data file per bucket (each (layout, f) value lands in
    * one task; a task holding several values writes one file per
    * value — asserted in LayoutSpec), so per-FILE footer min/max ==
    * per-bucket envelope.
    */
  def zorderFilesArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.Caches.memoized(spark, dir, "op:zorder_files") {
      val path = zorderFilesPath(dir)
      val ev = Tables.events(spark, dir).select(
        (dayofmonth(col("ts")) - 1).as("d"),
        hour(col("ts")).as("h"))
      val bk = ev.select(col("d"), col("h"),
        shiftright(shiftleft(col("d"), Bits).bitwiseOR(col("h")), 4).as("b_day"),
        shiftright(shiftleft(col("h"), Bits).bitwiseOR(col("d")), 4).as("b_hour"),
        shiftright(zInterleave(col("d"), col("h")), 4).as("b_z"))
      val long = bk.select(lit("day").as("layout"), col("b_day").as("f"), col("d"), col("h"))
        .unionByName(bk.select(lit("hour").as("layout"), col("b_hour").as("f"), col("d"), col("h")))
        .unionByName(bk.select(lit("z").as("layout"), col("b_z").as("f"), col("d"), col("h")))
      // sort key is PREFIXED with the partition columns (r14): the
      // dynamic-partition writer requires its output ordered by the
      // partition cols and silently inserts its own per-task sort when
      // the child's ordering doesn't start with them — the (d, h)-only
      // form paid that second sort every build. Prefixing keeps one
      // sort; within each (layout, f) run the (d, h) clustering — and
      // therefore every file's rows and footer envelope — is unchanged.
      long.repartition(col("layout"), col("f"))
        .sortWithinPartitions(col("layout"), col("f"), col("d"), col("h"))
        .write.mode("overwrite").partitionBy("layout", "f")
        .parquet(path)
      spark.read.parquet(path)
    }

  private[graft] def zorderFilesPath(dir: String): String =
    graft.Caches.artifactBase(dir).resolve("zorder_events").toString

  /** File-level pruning measured from the PERSISTED layouts: a
    * min/max-pruned scan must read a file iff the file's (d, h)
    * envelope INTERSECTS the box — even when the file holds no matching
    * row (the honest cost [[zorderPruning]]'s has-a-matching-row bucket
    * model understates). Envelopes are computed from the read-back
    * artifact rows, which for integer columns are bit-identical to the
    * Parquet footer statistics a real scan prunes on — LayoutSpec
    * cross-checks the footers directly via ParquetFileReader and
    * re-derives this query's z-layout count from them. One row:
    * files-touched per (box query × layout).
    */
  def zorderFilePruning(spark: SparkSession, dir: String): DataFrame = {
    val env = zorderFilesArtifact(spark, dir)
      .select(col("layout"), col("f").cast("long").as("f"), col("d"), col("h"))
      .groupBy(col("layout"), col("f"))
      .agg(min(col("d")).as("md"), max(col("d")).as("xd"),
        min(col("h")).as("mh"), max(col("h")).as("xh"))
    val hitA = col("xd") >= 10 && col("md") <= 19 // day box, any hour
    val hitB = col("xh") >= 8 && col("mh") <= 11  // hour box, any day
    env.agg(
      count(when(col("layout") === "day" && hitA, 1)).as("a_day_files"),
      count(when(col("layout") === "hour" && hitA, 1)).as("a_hour_files"),
      count(when(col("layout") === "z" && hitA, 1)).as("a_z_files"),
      count(when(col("layout") === "day" && hitB, 1)).as("b_day_files"),
      count(when(col("layout") === "hour" && hitB, 1)).as("b_hour_files"),
      count(when(col("layout") === "z" && hitB, 1)).as("b_z_files"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_zorder" -> ((s, d) => zorderPruning(s, d)),
    "op_zorder_files" -> ((s, d) => zorderFilePruning(s, d))
  )

  val oracles: Map[String, String] = Map(
    "op_zorder" ->
      s"""WITH e AS (
            SELECT dayofmonth(CAST(ts AS TIMESTAMP)) - 1 AS d,
                   hour(CAST(ts AS TIMESTAMP)) AS h FROM events),
          bk AS (
            SELECT d, h,
                   ((d << $Bits) | h) >> 4 AS b_day,
                   ((h << $Bits) | d) >> 4 AS b_hour,
                   ${zSql("d", "h")} >> 4 AS b_z
            FROM e)
          SELECT
            CAST(sum(CASE WHEN d BETWEEN 10 AND 19 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(sum(CASE WHEN h BETWEEN 8 AND 11 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
            CAST(count(DISTINCT CASE WHEN d BETWEEN 10 AND 19 THEN b_day END) AS BIGINT) AS a_day,
            CAST(count(DISTINCT CASE WHEN d BETWEEN 10 AND 19 THEN b_hour END) AS BIGINT) AS a_hour,
            CAST(count(DISTINCT CASE WHEN d BETWEEN 10 AND 19 THEN b_z END) AS BIGINT) AS a_z,
            CAST(count(DISTINCT CASE WHEN h BETWEEN 8 AND 11 THEN b_day END) AS BIGINT) AS b_day,
            CAST(count(DISTINCT CASE WHEN h BETWEEN 8 AND 11 THEN b_hour END) AS BIGINT) AS b_hour,
            CAST(count(DISTINCT CASE WHEN h BETWEEN 8 AND 11 THEN b_z END) AS BIGINT) AS b_z
          FROM bk""",
    // envelope-intersection replay of the persisted-file pruning: the
    // file assignment is pure arithmetic over (d, h), so DuckDB derives
    // the same per-(layout, file) min/max envelopes the Parquet footers
    // carry and counts boxes-intersecting files identically
    "op_zorder_files" ->
      s"""WITH e AS (
            SELECT dayofmonth(CAST(ts AS TIMESTAMP)) - 1 AS d,
                   hour(CAST(ts AS TIMESTAMP)) AS h FROM events),
          bk AS (
            SELECT d, h,
                   ((d << $Bits) | h) >> 4 AS b_day,
                   ((h << $Bits) | d) >> 4 AS b_hour,
                   ${zSql("d", "h")} >> 4 AS b_z
            FROM e),
          lf AS (
            SELECT 'day' AS layout, b_day AS f, d, h FROM bk
            UNION ALL SELECT 'hour', b_hour, d, h FROM bk
            UNION ALL SELECT 'z', b_z, d, h FROM bk),
          env AS (
            SELECT layout, f, min(d) AS md, max(d) AS xd,
                   min(h) AS mh, max(h) AS xh
            FROM lf GROUP BY layout, f)
          SELECT
            CAST(count(CASE WHEN layout = 'day'  AND xd >= 10 AND md <= 19 THEN 1 END) AS BIGINT) AS a_day_files,
            CAST(count(CASE WHEN layout = 'hour' AND xd >= 10 AND md <= 19 THEN 1 END) AS BIGINT) AS a_hour_files,
            CAST(count(CASE WHEN layout = 'z'    AND xd >= 10 AND md <= 19 THEN 1 END) AS BIGINT) AS a_z_files,
            CAST(count(CASE WHEN layout = 'day'  AND xh >= 8  AND mh <= 11 THEN 1 END) AS BIGINT) AS b_day_files,
            CAST(count(CASE WHEN layout = 'hour' AND xh >= 8  AND mh <= 11 THEN 1 END) AS BIGINT) AS b_hour_files,
            CAST(count(CASE WHEN layout = 'z'    AND xh >= 8  AND mh <= 11 THEN 1 END) AS BIGINT) AS b_z_files
          FROM env"""
  )
}
