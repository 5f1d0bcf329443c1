package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.BatchLogit

class BatchLogitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def mdFeature(w: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(w.getBytes)
    BigInt(1, d.take(4)).toLong % BatchLogit.NumFeatures
  }

  private def tok(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").toSeq
      .map(_.replaceAll("(^[^a-z]+|[^a-z]+$)", "")).filter(_.nonEmpty)

  /** Independent scalar replay of the documented batch-GD protocol —
    * decimal weight arithmetic, double only inside the sigmoid.
    */
  private def reference(docs: Seq[String], iters: Int): Map[Long, Double] = {
    val insts = docs.map { t =>
      val ts = tok(t)
      (if (ts.contains("spark")) 1 else 0, ts.map(mdFeature))
    }.filter(_._2.nonEmpty)
    var w: Map[Long, BigDecimal] =
      insts.flatMap(_._2).distinct.map(_ -> BigDecimal(0).setScale(6)).toMap
    for (_ <- 1 to iters) {
      val probs = insts.map { case (label, fs) =>
        val score = fs.map(w).sum.toDouble
        (label, fs, BigDecimal(r6(1.0 / (1.0 + math.exp(-score)))).setScale(6))
      }
      val grad = probs.flatMap { case (label, fs, p) => fs.map(_ -> (BigDecimal(label) - p)) }
        .groupBy(_._1).map { case (f, ts) => f -> ts.map(_._2).sum }
      w = w.map { case (f, wt) =>
        f -> (wt + BatchLogit.Eta * grad.getOrElse(f, BigDecimal(0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
    }
    w.map { case (f, wd) => f -> wd.toDouble }
  }

  test("distributed batch GD equals the scalar protocol reference") {
    val docs = Tables.documents(spark, sf).select("text").collect().map(_.getString(0)).toSeq
    val ref = reference(docs, BatchLogit.Iterations)
    val got = BatchLogit.train(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == ref)
  }

  test("the trained model actually separates the planted label") {
    import org.apache.spark.sql.functions._
    val w = BatchLogit.train(spark, sf)
    val scored = BatchLogit.occurrences(spark, sf)
      .join(w, "feature")
      .groupBy(col("docid"), col("label"))
      .agg(sum(col("weight")).as("score"))
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    val spamMean = scored.filter(_._1 == 1).map(_._2).sum /
      math.max(1, scored.count(_._1 == 1))
    val hamMean = scored.filter(_._1 == 0).map(_._2).sum /
      math.max(1, scored.count(_._1 == 0))
    assert(spamMean > hamMean, s"spark-doc mean $spamMean !> other mean $hamMean")
    val acc = scored.count { case (l, s) => (s > 0) == (l == 1) }.toDouble / scored.length
    assert(acc > 0.7, s"training accuracy $acc")
  }
}
