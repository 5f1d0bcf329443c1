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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_zorder" -> ((s, d) => zorderPruning(s, d))
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
          FROM bk"""
  )
}
