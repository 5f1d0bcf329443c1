package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.GraftExpr
import graft.Tables

/** Manually composed bloom-filter runtime join pruning — the 100 TB-class
  * technique behind Spark's own InjectRuntimeFilter rule, surfaced as a
  * library operator: when a selective dimension predicate shrinks the
  * build side far below the probe side, ship a BLOOM of the build keys to
  * the probe scan and drop non-joining probe rows BEFORE they pay the
  * shuffle. The filter admits false positives (bounded by the sizing
  * below) and zero false negatives, so a normal equi-join downstream
  * yields the exact result — the bloom only cuts shuffled bytes.
  *
  * Built on the native Catalyst expressions ([[BloomFilterAggregate]] /
  * [[BloomFilterMightContain]], both codegen-capable) over xxhash64 keys
  * — the §2.10 posture: native expressions, no udf(). The aggregate's
  * one-row binary sketch broadcasts to every probe partition; bloom
  * insertion is bit-OR so partial aggregation merges associatively,
  * shuffle-order-free.
  *
  * Correctness gate: the bloom-pruned join must equal the plain join
  * (the oracle replays the plain SQL join — FP handling is invisible by
  * construction). The PRUNING effect is measured in RuntimeFilterSpec:
  * pruned probe count must sit in [true-match count, probe count], with
  * the observed FP rate reported.
  */
object RuntimeFilter {

  /** A Column holding the bloom sketch of `keys` (long-typed input;
    * callers hash with xxhash64). Sized for `estItems` at ~1% FP
    * (n · 10 bits, the classic m/n = 9.6 point); 100 TB note: the sketch
    * is O(bits), independent of probe size — a 100 M-key build side at
    * 10 bits/key broadcasts a 125 MB filter, so at that scale size for
    * the FP·shuffle-cost tradeoff, not for maximal precision.
    */
  def bloomAgg(keys: Column, estItems: Long): Column =
    GraftExpr.column(new BloomFilterAggregate(
      GraftExpr.expression(keys),
      GraftExpr.expression(lit(estItems)),
      GraftExpr.expression(lit(estItems * 10L))).toAggregateExpression())

  def mightContain(bloom: Column, key: Column): Column =
    GraftExpr.column(new BloomFilterMightContain(
      GraftExpr.expression(bloom), GraftExpr.expression(key)))

  /** Probe rows surviving the bloom of the build keys: superset of the
    * truly-joining rows, FP-bounded. The sketch enters the probe filter
    * as an uncorrelated SCALAR SUBQUERY (`might_contain` requires a
    * constant or scalar-subquery bloom — the same shape InjectRuntimeFilter
    * plants): Spark executes the one-row aggregate once and inlines the
    * result into every probe partition, so the probe side plans as a
    * plain filtered scan, no join node at all.
    */
  def bloomPruned(probe: DataFrame, probeKey: String,
                  build: DataFrame, buildKey: String,
                  estItems: Long): DataFrame = {
    val bloom = build.agg(bloomAgg(xxhash64(col(buildKey)), estItems).as("bf")).scalar()
    probe.where(mightContain(bloom, xxhash64(col(probeKey))))
  }

  /** The registered query: revenue by return flag for lineitems of
    * urgent 1996 orders — probe (lineitem) bloom-pruned by the filtered
    * order keys before the exact equi-join. Join output ≡ the plain
    * join, so the oracle is the plain SQL join; the bloom's work is
    * measured in the spec, not the gate.
    */
  def bloomJoinRevenue(spark: SparkSession, dir: String, dt: String = "1996"): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(Tables.dateMatches(col("o_orderdate"), dt) &&
        col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_returnflag"),
      col("l_extendedprice").cast("decimal(12,2)").as("price"),
      col("l_discount").cast("decimal(4,2)").as("disc"))
    val pruned = bloomPruned(li, "l_orderkey", o, "o_orderkey", estItems = 100000L)
    pruned.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_returnflag"),
        (col("price") * (lit(1) - col("disc"))).cast("decimal(18,4)").as("rev"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("rev")), 2).cast("double").as("revenue"))
  }

  // ---- portable bloom-of-blooms sketched semi-join (op_bloom_merged) ----
  //
  // The serve-time composition the opaque-sketch queries can't gate:
  // dedup ingestion keyed on a UNION of per-run bloom artifacts. Each
  // historical ingest run persists ITS OWN bloom of the document
  // fingerprints it saw; at serve time the runs' blooms merge word-wise
  // (bit_or — the ev_countmin_merged mergeable-sketch pattern, OR instead
  // of cell sum) and every incoming doc probes the merged filter. The
  // bloom here is PORTABLE DATA, not Spark's opaque binary sketch: a
  // (word_idx, bits) relation with md5-derived probe positions, so DuckDB
  // replays build, per-run artifacts, merge, and every membership
  // decision — false positives included — and the row rides the full
  // hash gate (op_bloom_join / dedup_incremental_bloom gate only the
  // FP-invisible exact join output).
  //
  // Sizing: 65536 bits (2048 x 32-bit words), K=3 probes — ~1e-7 FP at
  // the 400-doc gate tier, ~0.5% at the 4k-doc bench tier; the merged
  // table is <= 2048 rows regardless of corpus size (the O(bits) sketch
  // property that makes this the 100 TB serve-time shape: the corpus
  // never joins, only the sketch moves).

  private val BloomBits = 65536L
  private val BloomK = 3

  /** K md5-derived probe bit positions for a fingerprint string — the
    * repo's cross-engine hash convention (first 8 md5 hex chars as an
    * integer), one seeded hash per probe.
    */
  private def probeBits(fp: Column): Column =
    transform(sequence(lit(0), lit(BloomK - 1)),
      j => pmod(
        conv(substring(md5(concat(fp, lit(":"), j.cast("string"))), 1, 8), 16, 10)
          .cast("long"),
        lit(BloomBits)))

  /** One run's bloom as a (w, bits) relation: 32-bit words (shift stays
    * far from the sign bit, so both engines' BIGINT arithmetic agrees),
    * word-wise bit_or build — associative, shuffle-order-free.
    */
  private def bloomTable(fps: DataFrame): DataFrame =
    fps.select(explode(probeBits(col("fp"))).as("bit"))
      .select((col("bit") / 32).cast("long").as("w"),
        expr("shiftleft(1L, CAST(bit % 32 AS INT))").as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("bits"))

  /** The registered query: three historical ingest runs (doc_id % 5 ≠ 0,
    * split by doc_id % 3) each persist a bloom artifact; serve time
    * merges them and probes EVERY document — (doc_id, maybe_seen, seen),
    * where maybe_seen is the merged-bloom decision and seen the exact
    * fingerprint membership. seen ⇒ maybe_seen by construction (blooms
    * have no false negatives; the spec asserts it), and the word-wise OR
    * makes merge-of-runs ≡ monolithic build (the ir_index_merged
    * contract), which is why the oracle can rebuild one flat bloom.
    */
  def bloomServe(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Caches.memoized(spark, dir, "op:bloom_serve_docs")(
      Tables.documents(spark, dir).select(col("doc_id"), md5(col("text")).as("fp")))
    val hist = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
    val runs = (0 to 2).map { r =>
      graft.Caches.parquetArtifact(spark, dir, s"bloom_run$r")(
        bloomTable(hist.where(pmod(col("doc_id"), lit(3)) === r)))
    }
    val merged = runs.reduce(_ unionByName _)
      .groupBy(col("w")).agg(expr("bit_or(bits)").as("bits"))
    val probes = docs
      .select(col("doc_id"), explode(probeBits(col("fp"))).as("bit"))
      .select(col("doc_id"), (col("bit") / 32).cast("long").as("w"),
        expr("shiftleft(1L, CAST(bit % 32 AS INT))").as("m"))
    val maybe = probes.join(broadcast(merged), Seq("w"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("bits").bitwiseAND(col("m")) =!= 0, lit(false)).as("hit"))
      .groupBy(col("doc_id"))
      .agg((sum(when(col("hit"), 1L).otherwise(0L)) === BloomK).as("maybe_seen"))
    docs.join(maybe, Seq("doc_id"))
      .join(hist.select(col("fp"), lit(true).as("s")).distinct(), Seq("fp"), "left_outer")
      .select(col("doc_id"), col("maybe_seen"), coalesce(col("s"), lit(false)).as("seen"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_bloom_join" -> ((s, d) => bloomJoinRevenue(s, d)),
    "op_bloom_merged" -> ((s, d) => bloomServe(s, d))
  )

  val oracles: Map[String, String] = Map(
    "op_bloom_join" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY l_returnflag""",
    // full replay: probe positions, word build, merged membership — the
    // per-run split is invisible to the values (OR is associative), so
    // the oracle builds one flat bloom over the historical set
    "op_bloom_merged" ->
      """WITH docs AS (SELECT doc_id, md5(text) AS fp FROM documents),
         hist AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
         hbits AS (SELECT CAST('0x' || substring(md5(fp || ':' || CAST(j AS VARCHAR)), 1, 8)
                             AS BIGINT) % 65536 AS bit
                   FROM hist, unnest([0, 1, 2]) t(j)),
         bloom AS (SELECT bit // 32 AS w,
                          bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INT)) AS bits
                   FROM hbits GROUP BY 1),
         probes AS (SELECT doc_id,
                      CAST('0x' || substring(md5(fp || ':' || CAST(j AS VARCHAR)), 1, 8)
                        AS BIGINT) % 65536 AS bit
                    FROM docs, unnest([0, 1, 2]) t(j)),
         hits AS (SELECT p.doc_id,
                    coalesce((b.bits & (CAST(1 AS BIGINT) << CAST(p.bit % 32 AS INT))) <> 0,
                             false) AS hit
                  FROM probes p LEFT JOIN bloom b ON p.bit // 32 = b.w),
         mb AS (SELECT doc_id,
                  sum(CASE WHEN hit THEN 1 ELSE 0 END) = 3 AS maybe_seen
                FROM hits GROUP BY doc_id)
         SELECT d.doc_id, mb.maybe_seen,
                d.fp IN (SELECT fp FROM hist) AS seen
         FROM docs d JOIN mb USING (doc_id)"""
  )
}
