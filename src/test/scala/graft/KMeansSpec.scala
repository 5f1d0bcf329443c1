package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.KMeans
import org.apache.spark.sql.functions.col

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  /** Independent scalar replay of the documented protocol over collected
    * vectors (idiomatic collections, no shared loop code).
    */
  private def reference(vecs: Seq[(Long, Array[Float])], k: Int, iters: Int)
      : (Seq[Seq[Double]], Seq[Long]) = {
    var cents: Seq[Seq[Double]] =
      vecs.filter(_._1 < k).sortBy(_._1).map(_._2.map(_.toDouble).toSeq)
    var counts = Seq.fill(k)(0L)
    for (_ <- 1 to iters) {
      val assigned = vecs.map { case (_, v) =>
        val vd = v.map(_.toDouble)
        val best = cents.zipWithIndex
          .map { case (c, i) => (r6(cos(vd.toArray, c.toArray)), i) }
          .maxBy { case (c, i) => (c, -i) }._2
        (best, vd)
      }
      val byCell = assigned.groupBy(_._1)
      cents = (0 until k).map { c =>
        byCell.get(c).fold(cents(c)) { ms =>
          val n = ms.size
          ms.map(_._2).transpose.map(ds => r6(ds.sum / n)).toSeq
        }
      }
      counts = (0 until k).map(c => byCell.get(c).fold(0L)(_.size.toLong))
    }
    (cents, counts)
  }

  test("distributed trainer equals the scalar protocol reference") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().toSeq
    val (refC, refN) = reference(vecs, k = 8, iters = 5)
    val (gotC, gotN) = KMeans.train(spark, sf, k = 8, iterations = 5)
    assert(gotC.map(_.toSeq).toSeq == refC)
    assert(gotN.toSeq == refN)
  }

  test("single-pass multi-subspace trainer is bit-equal to per-slice trainOn") {
    import spark.implicits._
    val ds = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val m = 4; val subDim = 16; val k = 16; val iters = 3
    val combined = KMeans.trainOnSlices(ds, m, subDim, k, iters)
    (0 until m).foreach { mi =>
      val sliced = ds.map { case (id, v) => (id, v.slice(mi * subDim, (mi + 1) * subDim)) }
      val (refC, refN) = KMeans.trainOn(sliced, k, iters)
      assert(combined(mi)._1.map(_.toSeq).toSeq == refC.map(_.toSeq).toSeq,
        s"subspace $mi centroids diverge")
      assert(combined(mi)._2.toSeq == refN.toSeq, s"subspace $mi counts diverge")
    }
  }

  test("training improves the clustering objective over the init quantizer") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().toSeq
    val init = vecs.filter(_._1 < 8).sortBy(_._1).map(_._2.map(_.toDouble))
    val (trained, counts) = KMeans.train(spark, sf, k = 8, iterations = 5)
    def objective(cents: Seq[Array[Double]]): Double = {
      val per = vecs.map { case (_, v) =>
        val vd = v.map(_.toDouble)
        cents.map(c => cos(vd, c)).max
      }
      per.sum / per.size
    }
    assert(objective(trained.toSeq) >= objective(init.toSeq))
    assert(counts.sum == vecs.size, "every vector assigned exactly once")
    assert(counts.forall(_ > 0), "cell c always retains vector c")
  }
}
