package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Components

/** Exact oracle for the shared large-star/small-star connected-components
  * module: every case is checked against an in-test union-find, including
  * the long-chain shape (diameter = n) that motivated replacing the
  * O(diameter) min-label loops.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(nodes: Seq[Long], pairs: Seq[(Long, Long)],
                  partitions: Option[Int] = None,
                  shape: Components.Shape = Components.Shape.CoPartitioned): Map[Long, Long] = {
    import spark.implicits._
    Components.labels(nodes.toDF("id"), pairs.toDF("a", "b"), partitions,
      shape = shape)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def unionFind(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are min ids because unions always attach the larger root
    nodes.map(n => n -> find(n)).toMap
  }

  test("long chain labels to the minimum (the O(diameter) killer case)") {
    val nodes = (1L to 64L)
    val chain = (1L until 64L).map(i => (i, i + 1))
    val got = run(nodes, chain)
    assert(got == nodes.map(_ -> 1L).toMap)
  }

  test("isolated nodes, self-pairs, duplicate and reversed edges") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 9L)
    val pairs = Seq((2L, 1L), (1L, 2L), (2L, 2L), (4L, 5L), (5L, 4L), (4L, 5L))
    assert(run(nodes, pairs) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L, 9L -> 9L))
  }

  test("matches union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val nodes = (0L until 80L)
    val pairs = Seq.fill(70)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    assert(run(nodes, pairs) == unionFind(nodes, pairs))
    // the width-pinned variant is result-identical
    assert(run(nodes, pairs, partitions = Some(3)) == unionFind(nodes, pairs))
  }

  test("matches union-find on sparse and dense seeded graphs") {
    for ((seed, n, m) <- Seq((7, 40, 15), (11, 30, 200), (13, 120, 90))) {
      val rnd = new scala.util.Random(seed)
      val nodes = (0L until n.toLong)
      val pairs = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(run(nodes, pairs, partitions = Some(4)) == unionFind(nodes, pairs),
        s"seed=$seed n=$n m=$m")
    }
  }

  test("two parallel chains bridged at the far end (deep diameter, two roots merge)") {
    // chain A: 1..30 (min 1), chain B: 100..129 (min 100), bridge 30-129:
    // one component labeled 1; a second isolated chain 200..209 labels 200
    val a = (1L until 30L).map(i => (i, i + 1))
    val b = (100L until 129L).map(i => (i, i + 1))
    val c = (200L until 209L).map(i => (i, i + 1))
    val nodes = (1L to 30L) ++ (100L to 129L) ++ (200L to 209L)
    val got = run(nodes, a ++ b ++ c :+ (30L, 129L), partitions = Some(2))
    assert(got == unionFind(nodes, a ++ b ++ c :+ (30L, 129L)))
    assert(got(129L) == 1L && got(209L) == 200L)
  }

  test("star and merged-star shapes converge to one root") {
    // two stars joined by a bridge between their leaves
    val pairs = Seq((10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (20L, 22L), (13L, 22L))
    val nodes = Seq(10L, 11L, 12L, 13L, 20L, 21L, 22L)
    assert(run(nodes, pairs) == nodes.map(_ -> 10L).toMap)
  }

  test("both physical shapes are label-identical (co-partitioned vs broadcast-min)") {
    // the size-switch contract: the co-partitioned window shape (the
    // billion-node scale path and the fixture-scale default) and the
    // broadcast-min shape (the edges≫nodes opt-in) must be the SAME
    // round semantics — checked against union-find and each other on
    // seeded graphs spanning sparse, dense, and deep-chain regimes
    for ((seed, n, m) <- Seq((3, 60, 40), (5, 40, 300), (17, 200, 150))) {
      val rnd = new scala.util.Random(seed)
      val nodes = (0L until n.toLong)
      val pairs = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val want = unionFind(nodes, pairs)
      val co = run(nodes, pairs, partitions = Some(3), shape = Components.Shape.CoPartitioned)
      val bc = run(nodes, pairs, partitions = Some(3), shape = Components.Shape.BroadcastMin)
      assert(co == want, s"co-partitioned diverged: seed=$seed")
      assert(bc == want, s"broadcast-min diverged: seed=$seed")
    }
  }

  test("non-prepared star loop drops its round-0 edge cache once round 1 supersedes it") {
    // the initOwned contract (IterativeLoop.scala): a NON-prepared input
    // derives a loop-owned round-0 edge cache, and that frame must be
    // unpersisted as soon as round 1 replaces it — a leak here keeps a
    // full edge-set copy resident for the whole run at every tier
    import spark.implicits._
    Caches.releaseAll()
    val pairs = Seq((2L, 1L), (3L, 1L), (4L, 2L), (6L, 5L)).toDF("x", "y")
    val nodes = (1L to 6L).toDF("id")
    // labels() runs the loop eagerly (per-round convergence probes)
    val out = Components.labels(nodes, pairs, prepared = false).collect()
    assert(out.nonEmpty)
    val frames = Caches.snapshot._1
    assert(frames.nonEmpty, "loop must register its caches")
    // the first frame registered after the release is the loop-derived
    // round-0 edge cache (labels registers it before converge starts)
    assert(frames.head.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "round-0 edge cache must be unpersisted after round 1")
    // while the FINAL round's frame is still live (released by the host)
    assert(frames.last.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "final round frame should stay cached until releaseAll")
    Caches.releaseAll()
  }

  test("10k fixture tier runs hash-equal through both shapes") {
    // the pr_components_10k graph itself (mod-10000 events graph at the
    // test SF) pushed through both shapes: the one-row structural
    // summary (n_components, max_size, n_nodes) must match exactly —
    // the flip is covered by a test, not a scaladoc caveat
    val co = graft.graph.PageRank.componentsSummary(spark, TestSpark.sf,
      shape = Components.Shape.CoPartitioned).collect().toSeq
    val bc = graft.graph.PageRank.componentsSummary(spark, TestSpark.sf,
      shape = Components.Shape.BroadcastMin).collect().toSeq
    assert(co == bc, s"shapes diverged on the fixture graph: co=$co bc=$bc")
    assert(co.head.getLong(2) > 0)
  }
}
