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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_bloom_join" -> ((s, d) => bloomJoinRevenue(s, d))
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
         GROUP BY l_returnflag"""
  )
}
