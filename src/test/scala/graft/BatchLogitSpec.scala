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

class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("NB model: per-class smoothed likelihoods sum to 1, grid is complete") {
    import org.apache.spark.sql.functions._
    val m = graft.ml.NaiveBayes.train(spark, sf).collect()
    val byClass = m.groupBy(_.getString(0))
    // full V×C grid: every class carries the whole vocabulary
    val vocab = m.map(_.getString(1)).distinct.length
    byClass.foreach { case (lang, rows) =>
      assert(rows.length == vocab, s"$lang grid incomplete")
      val probSum = rows.map(r => math.exp(r.getDouble(3))).sum
      assert(math.abs(probSum - 1.0) < 1e-3, s"$lang Σp = $probSum")
    }
    // priors are class-constant and exp-sum to 1 across classes
    val priorSum = byClass.values.map(rs => math.exp(rs.head.getDouble(4))).sum
    assert(math.abs(priorSum - 1.0) < 1e-3, s"Σprior = $priorSum")
  }

  test("NB apply: one prediction per doc, winning score is the max") {
    import org.apache.spark.sql.functions._
    val pred = graft.ml.NaiveBayes.apply_(spark, sf)
    val docs = graft.Tables.documents(spark, sf).count()
    assert(pred.count() == docs)
    assert(pred.select(countDistinct(col("doc_id"))).head.getLong(0) == docs)
  }
}
