package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RuntimeFilter
import graft.Tables

/** The bloom runtime filter's two contracts, measured on the sf0.001
  * fixture: zero false negatives (pruned ⊇ truly-joining rows — the
  * property that makes the downstream exact join correct), and actual
  * pruning (pruned ≪ probe; the whole point of shipping the sketch).
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bloom pruning admits every joining row and drops most others") {
    try {
      val o = Tables.orders(spark, sf)
        .filter(Tables.dateMatches(col("o_orderdate"), "1996") &&
          col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val li = Tables.lineitem(spark, sf).select(col("l_orderkey"))
      val total = li.count()
      val pruned = RuntimeFilter.bloomPruned(li, "l_orderkey", o, "o_orderkey", 100000L)
      val prunedN = pruned.count()
      val trueN = li.join(o, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
      // no false negatives: every truly-joining probe row survives the bloom
      val lost = li.join(o, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .exceptAll(pruned).count()
      assert(lost == 0L, "bloom dropped a truly-joining probe row")
      assert(prunedN >= trueN && prunedN <= total)
      // the filter must actually prune: with ~3% build selectivity and a
      // 10-bits/key sketch the FP rate is ~1%, nowhere near pass-through
      assert(prunedN < total / 2, s"bloom pruned nothing: $prunedN of $total")
      info(s"probe=$total pruned=$prunedN true=$trueN " +
        f"fp_rate=${(prunedN - trueN).toDouble / math.max(1L, total - trueN)}%.4f")
    } finally Caches.releaseAll()
  }

  test("bloom-pruned join result equals the plain join result") {
    try {
      val viaBloom = RuntimeFilter.bloomJoinRevenue(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val o = Tables.orders(spark, sf)
        .filter(Tables.dateMatches(col("o_orderdate"), "1996") &&
          col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val plain = Tables.lineitem(spark, sf)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_returnflag"),
          (col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(4,2)")))
            .cast("decimal(18,4)").as("rev"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("rev")), 2).cast("double").as("revenue"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viaBloom == plain)
    } finally Caches.releaseAll()
  }

  test("merged per-run blooms: no false negatives, sane false-positive rate") {
    try {
      val rows = RuntimeFilter.bloomServe(spark, sf).collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
      // the bloom contract: every truly-seen fingerprint hits the merged
      // filter (OR-merge cannot lose a bit any run set)
      val falseNeg = rows.filter { case (_, maybe, seen) => seen && !maybe }
      assert(falseNeg.isEmpty, s"false negatives: ${falseNeg.take(5).mkString(",")}")
      // fixture sanity: historical docs (4/5 of the corpus) are seen,
      // and at 65536 bits the unseen fifth mostly misses the filter
      val unseen = rows.filter(!_._3)
      assert(unseen.nonEmpty, "fixture has no unseen docs")
      val fp = unseen.count(_._2)
      assert(fp.toDouble / unseen.size < 0.2,
        s"false-positive rate implausibly high: $fp of ${unseen.size}")
      info(s"unseen=${unseen.size} false_positives=$fp")
    } finally Caches.releaseAll()
  }
}
