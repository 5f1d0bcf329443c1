package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Table-maintenance operators a production lake runs between queries —
  * snapshot diffing (CDC), targeted row purge (GDPR right-to-be-
  * forgotten), and mixed-schema ingestion. Each stages REAL Parquet
  * artifacts under the session root and hash-gates the semantic result
  * against an oracle that re-derives the same transformation from the
  * raw table — the storage detour must be value-transparent.
  */
object Maintenance {

  /** Deterministic "next snapshot" of events: rows with event_id % 97 = 0
    * deleted, values doubled where event_id % 101 = 0, and a clone with
    * event_id + 10⁷ inserted where event_id % 103 = 0 — every CDC change
    * class present by construction. Staged once as a Parquet artifact.
    */
  private def snapshotV2(spark: SparkSession, dir: String): DataFrame =
    graft.Caches.parquetArtifact(spark, dir, "maint_snapshot_v2") {
      val base = Tables.events(spark, dir)
        .where(pmod(col("event_id"), lit(97L)) =!= 0)
        .withColumn("value",
          when(pmod(col("event_id"), lit(101L)) === 0, col("value") * 2)
            .otherwise(col("value")))
        // PLANTED NULLs: v2 rows whose only change is a hashed column
        // going NULL (props) or a value column going NULL (value — also
        // the delta input), so the gate actually exercises the NULL
        // fingerprint semantics the sentinel coalesce in [[snapshotDiff]]
        // pins (concat_ws would silently SKIP a NULL arg while the
        // oracle's || would NULL the whole hash — masked until a NULL
        // exists to disagree on)
        .withColumn("props",
          when(pmod(col("event_id"), lit(109L)) === 0, lit(null).cast("string"))
            .otherwise(col("props")))
        .withColumn("value",
          when(pmod(col("event_id"), lit(113L)) === 0, lit(null).cast("double"))
            .otherwise(col("value")))
      val inserts = Tables.events(spark, dir)
        .where(pmod(col("event_id"), lit(103L)) === 0)
        .withColumn("event_id", col("event_id") + 10000000L)
      base.unionByName(inserts)
    }

  /** Snapshot diff (the CDC question "what changed between versions"):
    * full-outer join on the primary key comparing a deterministic row
    * fingerprint, rolled up to change-class counts plus exact value
    * movement. At 100 TB this is the same plan — one co-partitioned
    * full-outer on the key, no row ever compared twice; with bucketed
    * snapshots (op_bucketed_join) it runs exchange-free.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    // Every hashed field is coalesced to a chr(1) sentinel BEFORE
    // concatenation: concat_ws silently SKIPS NULL args (so (a,NULL,b)
    // and (a,b,NULL) would fingerprint equal — the '|' boundary vanishes
    // with the field) while the oracle's '||' would NULL the whole hash;
    // the sentinel makes NULL handling and field boundaries identical in
    // both engines (DuckDB mirrors with coalesce(..., chr(1))).
    def f(c: org.apache.spark.sql.Column) = coalesce(c.cast("string"), lit("\u0001"))
    def keyed(df: DataFrame, side: String) = df.select(
      col("event_id"),
      md5(concat_ws("|", f(col("ts")), f(col("user_id")),
        f(col("event_type")), f(col("value").cast("decimal(12,2)")), f(col("props"))))
        .as(s"h_$side"),
      col("value").cast("decimal(12,2)").as(s"v_$side"))
    keyed(Tables.events(spark, dir), "a")
      .join(keyed(snapshotV2(spark, dir), "b"), Seq("event_id"), "full_outer")
      .select(
        when(col("h_a").isNull, "added")
          .when(col("h_b").isNull, "removed")
          .when(col("h_a") =!= col("h_b"), "changed")
          .otherwise("unchanged").as("change"),
        coalesce(col("v_b"), lit(0).cast("decimal(12,2)")).as("vb"),
        coalesce(col("v_a"), lit(0).cast("decimal(12,2)")).as("va"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("vb") - col("va")).cast("double").as("value_delta"))
  }

  /** Targeted purge: every event of the forget-list users (user_id %
    * 37 = 0) removed and the table REWRITTEN as a Parquet artifact; the
    * gate aggregates FROM the rewritten files — remaining forget-list
    * rows pinned at zero next to the preserved complement's exact
    * checksum, so both halves of the contract (deletion complete,
    * survivors untouched) ride one hash.
    */
  def purge(spark: SparkSession, dir: String): DataFrame = {
    val purged = graft.Caches.parquetArtifact(spark, dir, "maint_purged") {
      Tables.events(spark, dir).where(pmod(col("user_id"), lit(37L)) =!= 0)
    }
    purged.agg(
      count(lit(1)).as("n_rows"),
      sum(when(pmod(col("user_id"), lit(37L)) === 0, 1L).otherwise(0L))
        .as("n_forgotten_remaining"),
      count_distinct(col("user_id")).as("n_users"),
      sum(col("event_id")).as("sum_event_id"),
      sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
  }

  /** Mixed-schema ingestion: two batches land with DIFFERENT schemas
    * (batch 2 adds the event_type column — the crawler-upgraded-mid-run
    * case), read back through mergeSchema so early rows surface the new
    * column as null; the rollup groups on the evolved column with its
    * null bucket. mergeSchema costs one footer pass per file at listing
    * time — the documented price of schema drift at 100 TB.
    */
  def schemaMerge(spark: SparkSession, dir: String): DataFrame = {
    val merged = graft.Caches.memoized(spark, dir, "op:schema_merge") {
      val root = graft.Caches.artifactBase(dir).resolve("schema_merge").toString
      val ev = Tables.events(spark, dir)
      ev.where(pmod(col("event_id"), lit(2L)) === 0)
        .select(col("event_id"), col("user_id"),
          col("value").cast("decimal(12,2)").as("value"))
        .write.mode("overwrite").parquet(s"$root/b=1")
      ev.where(pmod(col("event_id"), lit(2L)) === 1)
        .select(col("event_id"), col("user_id"),
          col("value").cast("decimal(12,2)").as("value"), col("event_type"))
        .write.mode("overwrite").parquet(s"$root/b=2")
      spark.read.option("mergeSchema", "true").parquet(s"$root/b=1", s"$root/b=2")
    }
    merged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("user_id")).as("n_users"),
        sum(col("value")).cast("double").as("sum_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_snapshot_diff" -> ((s, d) => snapshotDiff(s, d)),
    "op_purge"         -> ((s, d) => purge(s, d)),
    "src_schema_merge" -> ((s, d) => schemaMerge(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "op_snapshot_diff" ->
      """WITH a AS (SELECT event_id,
             md5(coalesce(CAST(CAST(ts AS TIMESTAMP) AS VARCHAR), chr(1)) || '|' ||
                 coalesce(CAST(user_id AS VARCHAR), chr(1)) || '|' ||
                 coalesce(event_type, chr(1)) || '|' ||
                 coalesce(CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR), chr(1)) || '|' ||
                 coalesce(props, chr(1))) AS h,
             CAST(value AS DECIMAL(12,2)) AS v
           FROM events),
         v2 AS (
           SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_id % 113 = 0 THEN NULL
                  WHEN event_id % 101 = 0 THEN value * 2 ELSE value END AS value,
             CASE WHEN event_id % 109 = 0 THEN NULL ELSE props END AS props
           FROM events WHERE event_id % 97 <> 0
           UNION ALL
           SELECT event_id + 10000000, ts, user_id, event_type, value, props
           FROM events WHERE event_id % 103 = 0),
         b AS (SELECT event_id,
             md5(coalesce(CAST(CAST(ts AS TIMESTAMP) AS VARCHAR), chr(1)) || '|' ||
                 coalesce(CAST(user_id AS VARCHAR), chr(1)) || '|' ||
                 coalesce(event_type, chr(1)) || '|' ||
                 coalesce(CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR), chr(1)) || '|' ||
                 coalesce(props, chr(1))) AS h,
             CAST(value AS DECIMAL(12,2)) AS v
           FROM v2)
         SELECT CASE WHEN a.h IS NULL THEN 'added'
                     WHEN b.h IS NULL THEN 'removed'
                     WHEN a.h <> b.h THEN 'changed'
                     ELSE 'unchanged' END AS change,
                count(*) AS n_rows,
                CAST(sum(coalesce(b.v, 0) - coalesce(a.v, 0)) AS DOUBLE) AS value_delta
         FROM a FULL OUTER JOIN b USING (event_id)
         GROUP BY 1""",
    "op_purge" ->
      """SELECT count(*) AS n_rows,
           CAST(0 AS BIGINT) AS n_forgotten_remaining,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         FROM events WHERE user_id % 37 <> 0""",
    "src_schema_merge" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN NULL ELSE event_type END AS event_type,
           count(*) AS n_rows,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY 1""",
  )
}
