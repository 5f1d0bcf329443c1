package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Misra-Gries heavy hitters — the mergeable frequency sketch a 100 TB
  * stream demands when exact per-key counting would shuffle the full key
  * space: C counters summarize any stream with undercount ≤ n/(C+1), so
  * every key with true frequency > n/(C+1) is GUARANTEED present in the
  * summary (zero false negatives; Misra & Gries 1982, mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * The operator composes sketch + verify, the dedup-LSH protocol: pass 1
  * runs the O(C)-state sketch as a typed [[Aggregator]] (partial
  * aggregation merges sketches associatively — the decrement step makes
  * per-merge content order-SENSITIVE, but the guarantee is order-free);
  * pass 2 exactly recounts ONLY the ≤ C candidate keys (a semi-join —
  * the shuffle carries candidate rows, never the key space) and keeps
  * keys above the φn support threshold. The final output is therefore
  * EXACTLY the true heavy-hitter set with exact counts — deterministic
  * and oracle-replayable even though sketch internals are not.
  *
  * Fixture stream: events keyed by the harmonic step 1000 div
  * (1 + event_id mod 1000) — the KCore/skew-corpus technique for a
  * deterministic power-law head (key 1 ≈ half the range, key m ≈ 1/m²)
  * over fixture tables that are uniform by construction (measured: no
  * natural column in events/lineitem/documents has a > n/64 hitter).
  */
object MisraGries {

  /** Sketch capacity (counter count C): candidates are every key with
    * frequency > n/(C+1). Sized 2× below the φ = 1/16 query threshold so
    * the guarantee covers the support gap with margin.
    */
  val Capacity = 31

  /** φ: report keys with true count > n/16. */
  val SupportInv = 16L

  /** MG buffer: ≤ C (key, count) pairs in two parallel arrays. */
  case class MgBuf(keys: Array[Long], counts: Array[Long])

  class MgAgg(cap: Int) extends Aggregator[Long, MgBuf, MgBuf] {
    def zero: MgBuf = MgBuf(Array.emptyLongArray, Array.emptyLongArray)

    def reduce(b: MgBuf, x: Long): MgBuf = {
      val i = b.keys.indexOf(x)
      if (i >= 0) { b.counts(i) += 1; b }
      else if (b.keys.length < cap)
        MgBuf(b.keys :+ x, b.counts :+ 1L)
      else {
        // decrement-all: the classic MG step — drops every counter by 1
        // (absorbing the new item), removing zeroed entries
        val keep = b.counts.indices.filter(j => b.counts(j) > 1L)
        MgBuf(keep.map(b.keys).toArray, keep.map(j => b.counts(j) - 1L).toArray)
      }
    }

    /** Mergeable-summaries merge: pointwise sum, then subtract the
      * (C+1)-th largest count from all and keep positives — total error
      * stays ≤ n/(C+1) across any merge tree.
      */
    def merge(a: MgBuf, b: MgBuf): MgBuf = {
      val m = scala.collection.mutable.LongMap.empty[Long]
      var j = 0
      while (j < a.keys.length) { m(a.keys(j)) = m.getOrElse(a.keys(j), 0L) + a.counts(j); j += 1 }
      j = 0
      while (j < b.keys.length) { m(b.keys(j)) = m.getOrElse(b.keys(j), 0L) + b.counts(j); j += 1 }
      if (m.size <= cap) {
        val ks = m.keys.toArray
        MgBuf(ks, ks.map(m))
      } else {
        val cut = m.values.toArray.sorted(Ordering[Long].reverse)(cap)
        val ks = m.keys.toArray.filter(k => m(k) > cut)
        MgBuf(ks, ks.map(k => m(k) - cut))
      }
    }

    def finish(r: MgBuf): MgBuf = r
    def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  }

  /** Candidate keys from one sketch pass over `keyed` (single `key`
    * column) — ≤ cap keys, a superset of every key above n/(cap+1).
    */
  def candidates(keyed: DataFrame, cap: Int = Capacity): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed.select(col("key")).as[Long]
      .select(new MgAgg(cap).toColumn.name("buf")) // flattens to (keys, counts)
      .select(explode(col("keys")).as("key"))
  }

  /** The harmonic-skewed fixture stream. */
  def skewedKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      floor(lit(1000.0) / (lit(1L) + pmod(col("event_id"), lit(1000L))))
        .cast("long").as("key"))

  /** Heavy hitters with exact counts: sketch → exact recount of the ≤ C
    * candidates → support filter. Output = the exact φ-heavy-hitter set.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val keyed = skewedKeys(spark, dir)
    val total = keyed.agg(count(lit(1)).cast("long")).scalar()
    keyed
      .join(broadcast(candidates(keyed)), Seq("key"), "left_semi")
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(SupportInv) > total)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_heavy_hitters" -> ((s, d) => heavyHitters(s, d))
  )

  val oracles: Map[String, String] = Map(
    // the sketch is invisible to the gate by the superset guarantee +
    // exact-recount design: the output equals the plain exact query
    "ev_heavy_hitters" ->
      """WITH s AS (SELECT CAST(floor(1000.0 / (1 + event_id % 1000)) AS BIGINT) AS key
                    FROM events),
              t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s)
         SELECT key, CAST(count(*) AS BIGINT) AS cnt
         FROM s, t
         GROUP BY key, n
         HAVING count(*) * 16 > n"""
  )
}
