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
