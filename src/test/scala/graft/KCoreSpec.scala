package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.KCore

/** k-core invariants checked against an in-test reference peel on the
  * sf0.001 fixture graph: the survivor set must be the canonical k-core
  * (the peel's fixpoint is unique regardless of deletion order — the
  * textbook property the distributed round-synchronous peel relies on).
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def referencePeel(edges: Seq[(Long, Long)], k: Long): Map[Long, Long] = {
    var surv = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var done = false
    while (!done) {
      val deg = edges.filter(e => surv(e._1) && surv(e._2))
        .flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (id, xs) => id -> xs.size.toLong }
      val next = surv.filter(id => deg.getOrElse(id, 0L) >= k)
      done = next == surv
      surv = next
    }
    edges.filter(e => surv(e._1) && surv(e._2))
      .flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (id, xs) => id -> xs.size.toLong }
  }

  test("distributed peel lands on the canonical k-core with in-core degrees") {
    try {
      val und = KCore.edges(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val nNodes = und.flatMap(e => Seq(e._1, e._2)).distinct.size
      val k = math.ceil(0.6 * 2.0 * und.size / nNodes).toLong
      val expected = referencePeel(und, k)

      val got = KCore.kcore(spark, sf).collect()
      assert(got.length == nNodes, "one row per graph node")
      val core = got.filter(_.getBoolean(1))
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(core == expected,
        s"core mismatch: got ${core.size} nodes, expected ${expected.size}")
      // every in-core degree honors the threshold; non-core rows carry 0
      assert(core.values.forall(_ >= k))
      assert(got.filter(!_.getBoolean(1)).forall(_.getLong(2) == 0L))
      info(s"|V|=$nNodes k=$k core=${core.size} nodes")
    } finally Caches.releaseAll()
  }
}
