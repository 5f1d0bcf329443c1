package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.PageRank
import graft.ml.Spam

/** In-test oracles for the two non-SQL-expressible suites: a scalar Scala
  * reimplementation of the reference's protocols, run on collected sf0.001
  * data, compared against the distributed DataFrame plans.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Driver-side reference PageRank: same protocol as
    * RunPersonalizedPageRankBasic.java (distribute, vanish dangling mass,
    * clamp missing ≥0, re-inject at source, α jump at source only).
    */
  private def referencePr(edges: Seq[(Long, Long)], source: Long, iters: Int): Map[Long, Double] =
    referencePrOn((edges.map(_._1) ++ edges.map(_._2)).distinct, edges, source, iters)

  /** Explicit node set: mass sent to a dst not in `nodes` vanishes
    * (RunPersonalizedPageRankBasic.java:257-265) and returns via the
    * missing-mass re-injection.
    */
  private def referencePrOn(nodes: Seq[Long], edges: Seq[(Long, Long)],
                            source: Long, iters: Int): Map[Long, Double] = {
    // fixed-point micro-unit protocol (mirrors PageRank.runOnGraph and
    // the DuckDB oracle): 1.0 ≡ 1,000,000; half-up integer division for
    // the per-edge share and the α blend; exact long sums — every step
    // is integer arithmetic, so any engine replays it bit-for-bit. The
    // 150000/85 constants are DELIBERATELY hardcoded (independent
    // replica of α = 0.15); the loop's require pins its derived forms
    // to the same grid, so drift fails loudly there.
    def hdiv(a: Long, b: Long): Long = (a * 2 + b) / (b * 2) // round(a/b), a,b ≥ 0
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var rank = nodes.map(n => n -> (if (n == source) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val received = scala.collection.mutable.HashMap.empty[Long, Long]
        .withDefaultValue(0L)
      rank.foreach { case (n, r) =>
        adj.getOrElse(n, Nil).foreach(d => received(d) += hdiv(r, outdeg(n)))
      }
      val total = nodes.map(received(_)).sum
      val missing = math.max(0L, 1000000L - total)
      rank = nodes.map { n =>
        val base = received(n)
        val v =
          if (n == source) 150000L + ((base + missing) * 85 + 50) / 100
          else (base * 85 + 50) / 100
        n -> v
      }.toMap
    }
    rank.view.mapValues(_.toDouble / 1000000.0).toMap
  }

  test("distributed PageRank reproduces the scalar fixed-point protocol exactly") {
    val edges = PageRank.edges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sources = Seq(3L, 57L)
    val got = PageRank.run(spark, sf, sources, iterations = 10).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ref0 = referencePr(edges, 3L, 10)
    val ref1 = referencePr(edges, 57L, 10)
    got.foreach { case (id, (r0, r1)) =>
      assert(math.abs(r0 - ref0(id)) < 1e-9, s"node $id source 3")
      assert(math.abs(r1 - ref1(id)) < 1e-9, s"node $id source 57")
    }
  }

  test("topK returns k rows per source, ranked desc, source has the α floor") {
    val rows = PageRank.topK(spark, sf).collect()
    val bySource = rows.groupBy(_.getLong(0))
    assert(bySource.keySet == Set(3L, 57L))
    bySource.foreach { case (s, rs) =>
      assert(rs.length == 10)
      val ranks = rs.map(_.getAs[Double]("rank"))
      assert(ranks.sorted.reverse.sameElements(ranks), s"source $s not desc-sorted")
      // the source node re-injects its own jump: rank(source) ≥ α
      val selfRank = rs.find(_.getLong(1) == s).map(_.getAs[Double]("rank"))
      assert(selfRank.exists(_ >= PageRank.Alpha - 1e-6))
    }
  }

  test("adjacency-text graph: parse, vanish mass to unlisted nodes, match reference") {
    val path = getClass.getResource("/graph-adj.txt").getPath
    val (nodesDf, edgesDf) = PageRank.fromAdjacency(spark, path)
    val nodes = nodesDf.collect().map(_.getLong(0)).toSeq
    val edges = edgesDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(nodes.toSet == Set(1L, 2L, 3L, 4L, 6L)) // 5 is referenced but unlisted
    assert(edges.toSet == Set((1L, 2L), (1L, 3L), (2L, 1L), (2L, 4L),
      (4L, 5L), (4L, 1L), (6L, 1L), (6L, 6L)))
    // runOnGraph returns micro-unit longs; convert with the same exact
    // division the protocol edge uses
    val got = PageRank.runOnGraph(nodesDf, edgesDf, Seq(1L), 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1) / 1000000.0).toMap
    val want = referencePrOn(nodes, edges, 1L, 8)
    assert(got.keySet == want.keySet) // node 5 must NOT appear
    got.foreach { case (id, r) => assert(math.abs(r - want(id)) < 1e-12, s"node $id") }
    // dangling node 3 received mass; unlisted node 5's share vanished and
    // was re-injected at the source, so total mass stays 1 after phase 2
    // only if nothing leaked: the source absorbs alpha + missing
    assert(math.abs(got.values.sum - want.values.sum) < 1e-12)
  }

  test("10k measurement tier keeps the topK invariants of the oracle tier") {
    // the 100-node tier is hash-gated; this guards the mod/partitions
    // parameterization itself at the measurement scale (sf0.001 keeps it
    // a sub-second check: ~hundreds of distinct nodes at this sf)
    val rows = PageRank.topK(spark, sf, mod = 10000, partitions = 8).collect()
    val bySource = rows.groupBy(_.getLong(0))
    assert(bySource.keySet == Set(3L, 57L))
    bySource.foreach { case (s, rs) =>
      assert(rs.length == 10)
      val ranks = rs.map(_.getAs[Double]("rank"))
      assert(ranks.sorted.reverse.sameElements(ranks), s"source $s not desc-sorted")
      val selfRank = rs.find(_.getLong(1) == s).map(_.getAs[Double]("rank"))
      assert(selfRank.exists(_ >= PageRank.Alpha - 1e-6), s"source $s lost its jump floor")
    }
  }

  test("graph connected components match union-find; summary is consistent") {
    val edges = PageRank.edges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = PageRank.nodes(spark, sf).collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = nodes.map(n => n -> find(n)).toMap
    val got = PageRank.components(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    val s = PageRank.componentsSummary(spark, sf).head()
    val sizes = want.groupBy(_._2).map(_._2.size)
    // the summary tier uses mod=10000: recompute the expectation on it
    val e10k = PageRank.edges(spark, sf, 10000).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n10k = PageRank.nodes(spark, sf, 10000).collect().map(_.getLong(0))
    val p2 = scala.collection.mutable.Map(n10k.map(n => n -> n): _*)
    def find2(x: Long): Long =
      if (p2(x) == x) x else { val r = find2(p2(x)); p2(x) = r; r }
    e10k.foreach { case (a, b) =>
      val (ra, rb) = (find2(a), find2(b))
      if (ra != rb) p2(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comps = n10k.map(find2).groupBy(identity).map(_._2.length)
    assert(s.getAs[Long]("n_components") == comps.size)
    assert(s.getAs[Long]("max_size") == comps.max.toLong)
    assert(s.getAs[Long]("n_nodes") == n10k.length.toLong)
    assert(sizes.sum == nodes.length)
  }

  test("hits rejects a zero-iteration budget loudly") {
    // the a-frame is only assigned inside the power loop: zero rounds
    // would dereference a null frame at the final join, and an
    // un-stepped init is not a HITS result — pinned as a contract, not
    // left to the NPE
    val e = intercept[IllegalArgumentException] {
      PageRank.hits(spark, sf, iterations = 0)
    }
    assert(e.getMessage.contains("at least one iteration"))
    val e2 = intercept[IllegalArgumentException] {
      PageRank.hits(spark, sf, iterations = -3)
    }
    assert(e2.getMessage.contains("at least one iteration"))
  }

  test("triangles: both adjacency shapes match a brute-force enumeration") {
    // brute force: count triangles per node over the undirected distinct
    // edge set (the canonical orientation must not change the counts)
    val und = PageRank.edges(spark, sf).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .distinct
    val nbrs = (und.map { case (a, b) => a -> b } ++ und.map { case (a, b) => b -> a })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    PageRank.nodes(spark, sf).collect().map(_.getLong(0)).foreach(n => want(n) = 0L)
    for ((a, b) <- und; c <- nbrs(a) intersect nbrs(b) if a < b && b < c) {
      want(a) += 1; want(b) += 1; want(c) += 1
    }
    // BOTH physical shapes (broadcast adjacency = fixture-tier default,
    // shuffle adjacency = billion-node path) must be row-identical under
    // the same oracle — the shape switch can never change results
    Seq[PageRank.TriShape](PageRank.TriShape.BroadcastAdjacency,
      PageRank.TriShape.ShuffleAdjacency).foreach { shape =>
      val got = PageRank.triangles(spark, sf, shape = Some(shape)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want.toMap, s"shape $shape diverged from brute force")
    }
  }

  test("link prediction matches a brute-force common-neighbors replay") {
    val und = PageRank.edges(spark, sf, mod = 10000).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    und.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val got = PageRank.linkPredict(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    // brute force for every query node: CN over non-adjacent candidates,
    // top-3 by (count desc, id)
    val want = (0L until 200L).flatMap { q =>
      if (!adj.contains(q)) Nil
      else {
        val cands = adj.keys.filter(w => w != q && !adj(q).contains(w))
          .map(w => w -> (adj(q) & adj(w)).size.toLong)
          .filter(_._2 > 0).toSeq
          .sortBy { case (w, c) => (-c, w) }.take(3)
        cands.zipWithIndex.map { case ((w, c), i) => (q, i + 1) -> (w, c) }
      }
    }.toMap
    assert(got == want, s"${got.size} vs ${want.size} predictions")
    // predictions are genuinely non-edges
    got.foreach { case ((q, _), (w, _)) =>
      assert(!und.contains((math.min(q, w), math.max(q, w))), s"($q,$w) is an edge") }
  }

  test("Adamic-Adar ranking matches a brute-force decimal replay") {
    val und = PageRank.edges(spark, sf, mod = 10000).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    und.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    def w6(v: Long): BigDecimal =
      BigDecimal(1.0 / math.log(adj(v).size.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val got = PageRank.linkPredictAdamicAdar(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.nonEmpty)
    val want = (0L until 200L).flatMap { q =>
      if (!adj.contains(q)) Nil
      else {
        val cands = adj.keys.filter(w => w != q && !adj(q).contains(w))
          .map { w =>
            val cn = adj(q) & adj(w)
            (w, cn.size.toLong, cn.toSeq.map(w6).sum)
          }
          .filter(_._2 > 0).toSeq
          .sortBy { case (w, _, aa) => (-aa, w) }.take(3)
        cands.zipWithIndex.map { case ((w, c, aa), i) =>
          (q, i + 1) -> (w, c, aa.toDouble) }
      }
    }.toMap
    assert(got == want, s"${got.size} vs ${want.size} AA predictions")
  }

  test("partitionGraph: hash and range partitionings cover all nodes, range is ordered") {
    val n = PageRank.nodes(spark, sf)
    val e = PageRank.edges(spark, sf)
    val total = n.count()
    for (byRange <- Seq(false, true)) {
      val parted = PageRank.partitionGraph(n, e, 4, byRange)
      assert(parted.rdd.getNumPartitions == 4)
      assert(parted.count() == total)
      if (byRange) {
        // range partitions hold disjoint, ordered id ranges
        val ranges = parted.rdd.mapPartitionsWithIndex { (i, rows) =>
          val ids = rows.map(_.getLong(0)).toSeq
          if (ids.isEmpty) Iterator.empty
          else Iterator((i, ids.min, ids.max))
        }.collect().sortBy(_._1)
        ranges.sliding(2).foreach {
          case Array((_, _, max1), (_, min2, _)) => assert(max1 < min2)
          case _ =>
        }
      }
    }
  }

  test("outdegree matches a direct computation") {
    val got = PageRank.outDegrees(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = PageRank.edges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(got == want)
  }

  test("bfs on a hand graph: path distances, branch, multi-source min, unreached") {
    import spark.implicits._
    // path 1-2-3-4, branch 3-5, isolated pair 8-9: from {1}, dist(5)=3
    // through the branch; {8,9} unreachable
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (8L, 9L)).toDF("a", "b")
    val nodesDf = Seq(1L, 2L, 3L, 4L, 5L, 8L, 9L).toDF("id")
    def run(sources: Seq[Long]): Map[Long, Long] =
      PageRank.bfsOnGraph(nodesDf, und, sources).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Seq(1L)) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 3L, 8L -> -1L, 9L -> -1L))
    // multi-source takes the min over sources; the pair is now covered
    assert(run(Seq(4L, 8L)) == Map(4L -> 0L, 3L -> 1L, 2L -> 2L, 5L -> 2L,
      1L -> 3L, 8L -> 0L, 9L -> 1L))
  }

  test("sssp on a hand graph matches scalar Bellman-Ford with the shared weights") {
    import spark.implicits._
    // same topology as the bfs spec plus a direct 1-4 edge: hop-shorter
    // paths must LOSE to weight-cheaper detours when the weights say so
    val undSeq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (8L, 9L), (1L, 4L))
    val nodeSeq = Seq(1L, 2L, 3L, 4L, 5L, 8L, 9L)
    def w(v: Long, n: Long): Long = (v * 31 + n) % 9 + 1
    def scalar(sources: Seq[Long]): Map[Long, Long] = {
      val adj = undSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val dist = scala.collection.mutable.HashMap(sources.map(_ -> 0L): _*)
      var changed = true
      while (changed) {
        changed = false
        adj.foreach { case (v, n) =>
          dist.get(v).foreach { dv =>
            if (dist.get(n).forall(_ > dv + w(v, n))) {
              dist(n) = dv + w(v, n); changed = true
            }
          }
        }
      }
      nodeSeq.map(id => id -> dist.getOrElse(id, -1L)).toMap
    }
    def run(sources: Seq[Long]): Map[Long, Long] =
      PageRank.ssspOnGraph(nodeSeq.toDF("id"), undSeq.toDF("a", "b"), sources)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Seq(1L)) == scalar(Seq(1L)))
    assert(run(Seq(4L, 8L)) == scalar(Seq(4L, 8L)))
    // weights are direction-asymmetric: the traversal direction decides
    assert(w(1L, 2L) != w(2L, 1L))
  }
}

class SpamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Scalar reference SGD fold (TrainSpamClassifier.scala:68-85 semantics). */
  private def referenceTrain(inst: Seq[(Long, Int, Seq[Int])]): Map[Int, Double] = {
    val w = scala.collection.mutable.HashMap.empty[Int, Double]
    inst.sortBy(_._1).foreach { case (_, label, feats) =>
      var score = 0.0
      feats.foreach(f => score += w.getOrElse(f, 0.0))
      val prob = 1.0 / (1.0 + math.exp(-score))
      feats.foreach(f => w.update(f, w.getOrElse(f, 0.0) + (label - prob) * Spam.Delta))
    }
    w.toMap
  }

  private def collectedInstances: Seq[(Long, Int, Seq[Int])] =
    Spam.instances(spark, sf).collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getAs[scala.collection.Seq[Int]](2).toSeq)
    }.toSeq

  test("distributed train reproduces the scalar sequential fold exactly") {
    val got = Spam.train(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val want = referenceTrain(collectedInstances)
    assert(got.keySet == want.keySet)
    got.foreach { case (f, wt) => assert(math.abs(wt - want(f)) < 1e-12, s"feature $f") }
  }

  test("reference instance-line format parses and trains to the scalar fold") {
    val path = getClass.getResource("/spam-train.txt").getPath
    val parsed = Spam.parseInstances(spark.read.text(path))
    val rows = parsed.collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getAs[scala.collection.Seq[Int]](2).toSeq)
    }.toSeq
    assert(rows.length == 40)
    assert(rows.count(_._2 == 1) == 13) // doc03, 06, ..., 39
    rows.foreach { case (_, _, feats) => assert(feats.length == 7) }
    val got = Spam.trainOn(parsed).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val want = referenceTrain(rows)
    assert(got.keySet == want.keySet)
    got.foreach { case (f, w) => assert(math.abs(w - want(f)) < 1e-12, s"feature $f") }
  }

  test("bounded sequential fold matches a scalar exact-decimal replay") {
    import graft.ml.BatchLogit
    val Half = BigDecimal.RoundingMode.HALF_UP
    val occ = BatchLogit.occurrences(spark, sf)
      .filter(org.apache.spark.sql.functions.col("docid") < Spam.SeqDocs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // independent replay: per docid ascending, score with current weights,
    // sigmoid rounded to 6 dp, update every occurrence by (label-prob)*δ
    val w = scala.collection.mutable.HashMap.empty[Long, BigDecimal]
    occ.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rows) =>
      val label = rows.head._2
      val feats = rows.map(_._3)
      val score = feats.map(f => w.getOrElse(f, BigDecimal(0))).sum
      val prob = BigDecimal(1.0 / (1.0 + math.exp(-score.toDouble))).setScale(6, Half)
      val inc = (BigDecimal(label) - prob) * BigDecimal("0.002")
      feats.foreach(f => w.update(f, w.getOrElse(f, BigDecimal(0)) + inc))
    }
    val want = w.map { case (f, wt) => f -> wt.toDouble }.toMap
    val got = Spam.trainSeq(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  /** The r8 registry spam_train row — the exact-decimal fold with NO
    * docid bound (recursive-CTE-gated driver-side) — against the same
    * scalar replay over the whole corpus.
    */
  test("full-corpus fold (registry spam_train) matches a scalar exact-decimal replay") {
    import graft.ml.BatchLogit
    val Half = BigDecimal.RoundingMode.HALF_UP
    val occ = BatchLogit.occurrences(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val w = scala.collection.mutable.HashMap.empty[Long, BigDecimal]
    occ.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rows) =>
      val label = rows.head._2
      val feats = rows.map(_._3)
      val score = feats.map(f => w.getOrElse(f, BigDecimal(0))).sum
      val prob = BigDecimal(1.0 / (1.0 + math.exp(-score.toDouble))).setScale(6, Half)
      val inc = (BigDecimal(label) - prob) * BigDecimal("0.002")
      feats.foreach(f => w.update(f, w.getOrElse(f, BigDecimal(0)) + inc))
    }
    val want = w.map { case (f, wt) => f -> wt.toDouble }.toMap
    val got = Spam.queries("spam_train")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("bounded-model scoring matches a scalar decimal replay") {
    import graft.ml.BatchLogit
    val w = Spam.trainSeq(spark, sf).collect()
      .map(r => r.getLong(0) ->
        BigDecimal(r.getDouble(1)).setScale(9, BigDecimal.RoundingMode.HALF_UP)).toMap
    val occ = BatchLogit.occurrences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val want = occ.groupBy(o => (o._1, o._2)).map { case ((d, l), rows) =>
      (d, l) -> rows.map(o => w.getOrElse(o._3, BigDecimal(0))).sum
    }
    val got = Spam.applySeq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getString(3))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (score, pred)) =>
      assert(score == want(k).toDouble, s"doc $k")
      assert(pred == (if (want(k) > 0) "spam" else "ham"))
    }
  }

  test("bounded ensemble combines three shard models decimal-exactly") {
    import graft.ml.BatchLogit
    val occ = BatchLogit.occurrences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def modelScores(m: Int): Map[(Long, Int), BigDecimal] = {
      val w = Spam.trainSeq(spark, sf, shardMod = m).collect()
        .map(r => r.getLong(0) ->
          BigDecimal(r.getDouble(1)).setScale(9, BigDecimal.RoundingMode.HALF_UP)).toMap
      occ.groupBy(o => (o._1, o._2)).map { case (k, rows) =>
        k -> rows.map(o => w.getOrElse(o._3, BigDecimal(0))).sum
      }
    }
    val s0 = modelScores(0); val s1 = modelScores(1); val s2 = modelScores(2)
    val got = Spam.ensembleSeq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getString(3), r.getString(4))).toMap
    assert(got.keySet == s0.keySet)
    got.foreach { case (k, (avg, pAvg, pVote)) =>
      val total = s0(k) + s1(k) + s2(k)
      assert(avg == total.toDouble / 3.0, s"doc $k avg")
      assert(pAvg == (if (total > 0) "spam" else "ham"))
      val votes = Seq(s0(k), s1(k), s2(k)).map(_.signum).sum
      assert(pVote == (if (votes > 0) "spam" else "ham"))
    }
  }

  test("seeded shuffle changes training order but stays deterministic") {
    val a = Spam.train(spark, sf, shuffleSeed = Some(7L)).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val b = Spam.train(spark, sf, shuffleSeed = Some(7L)).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  /** Pins the reference raw-double scoring semantics (as of r8 the
    * REGISTRY spam_apply row is the exact-decimal full-corpus form under
    * the recursive-CTE hash gate; the double form stays spec-pinned here
    * per the r7 verdict): applyModel over the full train fold must equal
    * applying the SpamSpec-verified scalar fold model (the one proven
    * exact against the distributed train above) — a hard in-repo equality
    * guarantee, not just the AUC bar. Tolerance 1e-9 on the 6-dp-rounded
    * score absorbs partial-agg double-merge-order ulps without ever
    * letting a wrong weight (δ = 2e-3 scale) through.
    */
  test("double-form apply equals scoring with the spec-verified scalar fold model") {
    val w = referenceTrain(collectedInstances)
    val want = collectedInstances.map { case (d, l, feats) =>
      (d, l) -> feats.map(f => w.getOrElse(f, 0.0)).sum
    }.toMap
    val got = Spam.applyModel(Spam.instancesShared(spark, sf), Spam.trainShared(spark, sf))
      .select(org.apache.spark.sql.functions.col("docid"),
        org.apache.spark.sql.functions.col("label"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("score"), 6).as("score"),
        org.apache.spark.sql.functions.col("predicted"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getString(3))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (score, pred)) =>
      val ws = want(k)
      val r6 = BigDecimal(ws).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(score - r6) < 1e-9, s"doc $k: $score vs $r6")
      assert(pred == (if (ws > 0) "spam" else "ham"), s"doc $k predicted")
    }
  }

  /** Same pin for the double-form ensemble: three scalar shard folds,
    * scored and combined exactly as [[Spam.ensemble]] declares (the
    * registry spam_ensemble row is the exact-decimal recursive-gated
    * form as of r8).
    */
  test("double-form ensemble equals combining the three spec-verified shard folds") {
    val inst = collectedInstances
    val shardScores = (0 until 3).map { m =>
      val w = referenceTrain(inst.filter { case (d, _, _) =>
        java.lang.Math.floorMod(d, 3L) == m })
      inst.map { case (d, l, feats) =>
        (d, l) -> feats.map(f => w.getOrElse(f, 0.0)).sum
      }.toMap
    }
    val got = Spam.ensemble(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getString(3), r.getString(4))).toMap
    assert(got.keySet == shardScores.head.keySet)
    got.foreach { case (k, (avg, pAvg, pVote)) =>
      val ss = shardScores.map(_(k))
      val wantAvg = BigDecimal(ss.sum / 3.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(avg - wantAvg) < 1e-9, s"doc $k avg: $avg vs $wantAvg")
      assert(pAvg == (if (wantAvg > 0) "spam" else "ham"), s"doc $k predicted_avg")
      val votes = ss.map(math.signum).sum
      assert(pVote == (if (votes > 0) "spam" else "ham"), s"doc $k predicted_vote")
    }
  }

  test("applyModel separates the training classes (trained-on-data sanity)") {
    val inst = Spam.instances(spark, sf)
    val scored = Spam.applyModel(inst, Spam.train(spark, sf)).collect()
    // one δ=0.002 pass on a tiny corpus doesn't calibrate the 0 threshold;
    // the meaningful claim is that learning moved scores the right way:
    // spam docs score strictly higher than ham docs on average
    val (spam, ham) = scored.partition(_.getAs[Int]("label") == 1)
    assert(spam.nonEmpty && ham.nonEmpty)
    val spamAvg = spam.map(_.getAs[Double]("score")).sum / spam.length
    val hamAvg = ham.map(_.getAs[Double]("score")).sum / ham.length
    assert(spamAvg > hamAvg, s"spam avg $spamAvg not above ham avg $hamAvg")
  }

  test("ensemble average equals mean of member scores") {
    val rows = Spam.ensemble(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_score")
      val pred = r.getAs[String]("predicted_avg")
      assert(if (avg > 0) pred == "spam" else pred == "ham")
    }
  }
}

/** Rank-sum AUC on the training set — the SURVEY §5/§7 stand-in for the
  * reference's 1-ROCA% quality metric (exact hash equality is the wrong
  * test for a learned score; threshold-free ranking quality is right).
  */
class SpamQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("model ranks spam above ham: AUC well above chance") {
    val scored = Spam.applyModel(Spam.instances(spark, sf), Spam.train(spark, sf))
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Double]("score")))
    val pos = scored.filter(_._1 == 1).map(_._2)
    val neg = scored.filter(_._1 == 0).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty)
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = wins / (pos.length.toLong * neg.length)
    assert(auc > 0.75, s"training-set AUC $auc")
  }

  /** Pins ml_roc_auc (the registered 1-ROCA% analog): the grouped
    * rank-identity fold must equal the brute-force O(P·N) Mann-Whitney
    * definition on the same held-out scores, and the trainSeq model must
    * genuinely discriminate on docs it never saw (AUC > 0.5).
    */
  test("ml_roc_auc equals brute-force pairwise AUC on the holdout") {
    import org.apache.spark.sql.functions._
    val row = Spam.queries("ml_roc_auc")(spark, sf).collect().head
    val (nPos, nNeg) = (row.getAs[Long]("n_pos"), row.getAs[Long]("n_neg"))
    val auc = row.getAs[Double]("auc")
    // same holdout scoring as the query, brute-forced: every (pos, neg)
    // pair wins 1 / ties 0.5 / loses 0
    val w = Spam.trainSeqShared(spark, sf)
      .select(col("feature"), col("weight").cast("decimal(18,9)").as("w"))
    val scored = graft.ml.BatchLogit.occurrences(spark, sf)
      .filter(col("docid") >= Spam.SeqDocs &&
        expr("pmod(conv(substring(md5(CAST(docid AS STRING)), 1, 8), 16, 10), 100)") >= 90)
      .groupBy(col("docid"), col("label"), col("feature"))
      .agg(count(lit(1)).as("cnt"))
      .join(w, Seq("feature"), "left_outer")
      .groupBy(col("docid"), col("label"))
      .agg(sum(col("cnt").cast("decimal(6,0)") * coalesce(col("w"),
        lit(java.math.BigDecimal.ZERO).cast("decimal(18,9)"))).as("s"))
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[java.math.BigDecimal]("s")))
    val pos = scored.filter(_._1 == 1).map(_._2)
    val neg = scored.filter(_._1 == 0).map(_._2)
    assert(pos.length.toLong == nPos && neg.length.toLong == nNeg)
    val wins = (for (p <- pos; n <- neg) yield {
      val c = p.compareTo(n); if (c > 0) 1.0 else if (c == 0) 0.5 else 0.0
    }).sum
    val brute = BigDecimal(wins / (pos.length.toLong * neg.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(auc - brute) < 1e-9, s"rank-identity $auc vs brute $brute")
    assert(auc > 0.5, s"holdout AUC $auc not above chance")
    assert(math.abs(row.getAs[Double]("roca_pct") -
      BigDecimal((1.0 - auc) * 100).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      < 1e-9)
  }
}
