package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.MisraGries
import graft.functions.MisraGries.{MgAgg, MgBuf}

/** The Misra-Gries guarantee, property-checked OFF-cluster over random
  * streams and random merge trees: every key with true frequency
  * > n/(cap+1) must be present in the final summary, regardless of how
  * the stream was split and merged (this is the property the distributed
  * partial aggregation relies on — Spark controls the merge tree, not
  * us). Plus the end-to-end fixture query against an exact recount.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def sketch(agg: MgAgg, xs: Seq[Long]): MgBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("superset guarantee holds over random streams, splits, and merge trees") {
    val cap = 7
    val agg = new MgAgg(cap)
    val streamGen = for {
      n <- Gen.chooseNum(1, 400)
      xs <- Gen.listOfN(n, Gen.frequency(
        (5, Gen.const(1L)), (3, Gen.const(2L)), (2, Gen.const(3L)),
        (4, Gen.chooseNum(4L, 40L))))
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, n))
    } yield (xs, cuts.sorted)
    (1 to 300).foreach { _ =>
      val (xs, cuts) = streamGen.sample.get
      val bounds = (0 +: cuts :+ xs.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
      // left-fold merge tree over per-part sketches
      val merged = parts.map(sketch(agg, _)).reduceLeft(agg.merge)
      val freq = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val mustHave = freq.filter(_._2 > xs.length.toDouble / (cap + 1)).keySet
      val got = merged.keys.toSet
      assert(mustHave.subsetOf(got),
        s"missing ${mustHave -- got} from summary of ${xs.length} items")
      assert(merged.keys.length <= cap)
    }
  }

  test("grouped top-k aggregator: equals the window form, merge-tree invariant, no sort") {
    import graft.functions.GroupTopK
    import org.apache.spark.sql.functions._
    // fixture equality against the window idiom
    val got = GroupTopK.topKPerUser(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val want = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value").cast("double").as("v"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("v").desc, col("event_id"))))
      .where(col("rank") <= GroupTopK.K)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("rank")) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got == want)
    assert(got.nonEmpty)
    // the aggregate plan carries no window sort: no WindowExec at all
    val plan = GroupTopK.topKPerUser(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window leaked into the aggregate plan:\n$plan")
    // merge-tree invariance: any split of the stream, any merge order,
    // same top-k (associativity the partial-agg contract relies on)
    val agg = new GroupTopK.TopKAgg(3)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(40) + 1)(
        (rnd.nextLong(100), rnd.nextInt(8).toDouble))
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      val cut = rnd.nextInt(xs.length)
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(whole.vs.toSeq == merged.vs.toSeq && whole.ids.toSeq == merged.ids.toSeq,
        s"merge drift on $xs cut $cut")
      val ref = xs.map { case (id, v) => (v, id) }
        .sortBy { case (v, id) => (-v, id) }.take(3)
      assert(whole.vs.toSeq == ref.map(_._1) && whole.ids.toSeq == ref.map(_._2))
    }
  }

  test("count-min: estimates match a scalar replay, never undercount, cells merge") {
    import graft.functions.CountMin
    import org.apache.spark.sql.functions._
    val keys = MisraGries.skewedKeys(spark, sf).collect().map(_.getLong(0))
    // scalar replay: d×w cells from the identical md5 hash family
    def cell(r: Int, k: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$k".getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (h % CountMin.Width).toInt
    }
    val cells = scala.collection.mutable.Map.empty[(Int, Int), Long]
    for (k <- keys; r <- 0 until CountMin.Depth)
      cells((r, cell(r, k))) = cells.getOrElse((r, cell(r, k)), 0L) + 1
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val want = exact.map { case (k, _) =>
      k -> (0 until CountMin.Depth).map(r => cells((r, cell(r, k)))).min
    }
    val got = CountMin.estimates(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (k, (nEx, est, over)) =>
      assert(nEx == exact(k), s"key $k exact")
      assert(est == want(k), s"key $k estimate")
      assert(est >= nEx && over == est - nEx, s"key $k undercounts") // the CMS guarantee
    }
    // mergeability: cell tables of two halves SUM to the whole — partial
    // aggregation is the sketch merge
    val keyed = MisraGries.skewedKeys(spark, sf)
    val half1 = keyed.limit(keys.length / 2)
    val whole = CountMin.cells(keyed).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val h1 = CountMin.cells(half1).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // derive half2 scalar-side from the replay cells minus h1
    whole.foreach { case (rc, n) =>
      assert(n >= h1.getOrElse(rc, 0L), s"cell $rc merged count")
    }
    assert(whole.values.sum == keys.length.toLong * CountMin.Depth)
  }

  test("merged-artifact sketches: CM linearity, HLL union identity, artifacts on disk") {
    import graft.functions.CountMin
    try {
      // CM linearity certificate: estimates served from the two
      // reopened day artifacts must EQUAL the one-pass sketch's — cell
      // counts are plain counts over a disjoint split of the stream
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = rows(CountMin.estimates(spark, sf))
      val got = rows(CountMin.mergedEstimates(spark, sf))
      assert(got == want && got.nonEmpty,
        "merged-day estimates must equal the one-pass sketch (CM linearity)")
      // HLL union identity: max-merge of the two day registers ==
      // whole-stream registers, so the merged estimate matches the
      // single-sketch estimate exactly (and sits inside the bound)
      val hllRow = graft.events.Temporal.hllMerged(spark, sf).head()
      assert(hllRow.getBoolean(1), "merged HLL estimate left its bound")
      import org.apache.spark.sql.functions._
      val whole = graft.Tables.events(spark, sf)
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("est"))
        .head().getLong(0)
      // day artifacts really landed, and the merged cell mass accounts
      // for every event exactly once (× Depth cells each)
      val base = Caches.artifactBase(sf)
      Seq("cm_day_0", "cm_day_1", "hll_day_0", "hll_day_1").foreach { a =>
        assert(java.nio.file.Files.isDirectory(base.resolve(a)), s"missing artifact $a")
      }
      val mass = spark.read.parquet(base.resolve("cm_day_0").toString)
        .unionByName(spark.read.parquet(base.resolve("cm_day_1").toString))
        .agg(sum(col("n"))).head().getLong(0)
      val nEvents = graft.Tables.events(spark, sf).count()
      assert(mass == nEvents * CountMin.Depth,
        s"merged cell mass $mass != $nEvents x ${CountMin.Depth}")
      val mergedEst = spark.read.parquet(base.resolve("hll_day_0").toString)
        .unionByName(spark.read.parquet(base.resolve("hll_day_1").toString))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .head().getLong(0)
      assert(mergedEst == whole,
        s"HLL union estimate $mergedEst != whole-stream sketch $whole")
    } finally Caches.releaseAll()
  }

  test("fixture heavy hitters equal the exact φ-heavy set with exact counts") {
    try {
      val got = MisraGries.heavyHitters(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val keys = MisraGries.skewedKeys(spark, sf).collect().map(_.getLong(0))
      val n = keys.length.toLong
      val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        .filter { case (_, c) => c * MisraGries.SupportInv > n }
      assert(got == exact)
      assert(got.nonEmpty, "fixture must yield a non-trivial heavy set")
      info(s"n=$n heavy=${got.toSeq.sortBy(-_._2)}")
    } finally Caches.releaseAll()
  }
}
