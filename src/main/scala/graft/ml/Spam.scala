package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.Text

/** a6 spam classifier: online SGD logistic regression + ensemble
  * (`TrainSpamClassifier.scala`, `ApplySpamClassifier.scala`,
  * `ApplyEnsembleSpamClassifier.scala`).
  *
  * Training is order-dependent and sequential by construction (the
  * reference runs `groupByKey(1)` and folds in-memory,
  * `TrainSpamClassifier.scala:68-85`); the Spark-native equivalent is one
  * partition + sortWithinPartitions + a mapPartitions fold — pinning both
  * the partition count and a deterministic row order. The reference's
  * `--shuffle` uses unseeded `Math.random` (`:52`); we replace it with a
  * deterministic hash key so results are reproducible (SURVEY §5
  * determinism rule). Scoring (J7) is fully distributed: explode features,
  * join the weight table, partial-aggregate per doc — no broadcast of an
  * unbounded model.
  *
  * Instances derive from the documents fixture: label = doc contains the
  * token "spark" (a learnable signal), features = per-occurrence token
  * hashes (the reference's feature-id lists are given in its input files;
  * hashing is the standard replacement).
  */
object Spam {
  val Delta = 0.002 // TrainSpamClassifier.scala:41
  val NumFeatures = 10000

  /** (docid, label, features) derived deterministically from documents. */
  def instances(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", Text.tokenize(col("text")))
      .select(
        col("doc_id").as("docid"),
        when(array_contains(col("toks"), "spark"), 1).otherwise(0).as("label"),
        transform(col("toks"),
          w => pmod(xxhash64(w), lit(NumFeatures)).cast("int")).as("features"))

  /** Parse the reference's instance-line format
    * (`TrainSpamClassifier.scala:43-55`): whitespace-separated
    * `docid {spam|ham} f1 f2 ...` with integer feature ids. Output schema
    * matches [[instances]] (docid, label, features) with string docids
    * hashed to longs when non-numeric.
    */
  def parseInstances(lines: DataFrame): DataFrame =
    lines
      .select(split(trim(col("value")), "\\s+").as("f"))
      .filter(size(col("f")) >= 2)
      .select(
        coalesce(expr("try_cast(f[0] AS BIGINT)"),
          pmod(xxhash64(col("f").getItem(0)), lit(Long.MaxValue))).as("docid"),
        when(col("f").getItem(1) === "spam", 1).otherwise(0).as("label"),
        expr("transform(slice(f, 3, size(f) - 2), x -> CAST(x AS INT))").as("features"))

  /** Sequential SGD fold (`TrainSpamClassifier.scala:68-85`): score with
    * current weights, sigmoid, update every feature occurrence by
    * (label − prob)·δ. Returns the weight table (feature, weight).
    */
  def train(spark: SparkSession, dir: String, shuffleSeed: Option[Long] = None): DataFrame =
    trainOn(instances(spark, dir), shuffleSeed)

  def trainOn(inst: DataFrame, shuffleSeed: Option[Long] = None): DataFrame = {
    val spark = inst.sparkSession
    import spark.implicits._
    val sortKey = shuffleSeed match {
      // O4 seeded-shuffle replacement: deterministic hash order, not
      // Math.random — same training order on every run and partitioning.
      case Some(s) => pmod(xxhash64(col("docid"), lit(s)), lit(Long.MaxValue))
      case None    => col("docid")
    }
    inst.withColumn("k", sortKey)
      .repartition(1).sortWithinPartitions(col("k"))
      .mapPartitions { rows =>
        val w = scala.collection.mutable.HashMap.empty[Int, Double]
        rows.foreach { r =>
          val label = r.getAs[Int]("label")
          val feats = r.getAs[scala.collection.Seq[Int]]("features")
          var score = 0.0
          feats.foreach(f => score += w.getOrElse(f, 0.0))
          val prob = 1.0 / (1.0 + math.exp(-score))
          feats.foreach(f => w.update(f, w.getOrElse(f, 0.0) + (label - prob) * Delta))
        }
        w.iterator.map { case (f, wt) => (f, wt) }
      }
      .toDF("feature", "weight")
  }

  /** Distributed scoring (`ApplySpamClassifier.scala:48-65`): score =
    * Σ weight(f) over feature occurrences; spam iff score > 0.
    */
  def applyModel(inst: DataFrame, model: DataFrame): DataFrame = {
    val scored = inst
      .select(col("docid"), col("label"), explode(col("features")).as("feature"))
      .join(model, Seq("feature"), "left_outer")
      .groupBy(col("docid"), col("label"))
      .agg(sum(coalesce(col("weight"), lit(0.0))).as("score"))
    scored.withColumn("predicted", when(col("score") > 0, "spam").otherwise("ham"))
  }

  /** 3-model ensemble (`ApplyEnsembleSpamClassifier.scala:76-108`): models
    * trained on disjoint shards (docid mod 3); combine by score average
    * and by sign vote.
    */
  def ensemble(spark: SparkSession, dir: String): DataFrame = {
    val inst = graft.Caches.register(instances(spark, dir).persist())
    val scores = (0 until 3).map { m =>
      val shard = inst.filter(pmod(col("docid"), lit(3)) === m)
      applyModel(inst, trainOn(shard))
        .select(col("docid"), col("label"), col("score").as(s"score_$m"))
    }
    val joined = scores.reduce(_.join(_, Seq("docid", "label")))
    joined
      .withColumn("avg_score",
        round((col("score_0") + col("score_1") + col("score_2")) / 3, 6).cast("double"))
      .withColumn("votes",
        signum(col("score_0")) + signum(col("score_1")) + signum(col("score_2")))
      .select(col("docid"), col("label"), col("avg_score"),
        when(col("avg_score") > 0, "spam").otherwise("ham").as("predicted_avg"),
        when(col("votes") > 0, "spam").otherwise("ham").as("predicted_vote"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sequential folds / model-dependent outputs: no SQL oracle (rows-only
    // driver check); exact-match oracle lives in SpamSpec against an
    // in-test reference fold.
    "spam_train"    -> ((s, d) => train(s, d)
      .select(col("feature"), round(col("weight"), 6).as("weight"))),
    "spam_apply"    -> ((s, d) => applyModel(instances(s, d), train(s, d))
      .select(col("docid"), col("label"), round(col("score"), 6).as("score"), col("predicted"))),
    "spam_ensemble" -> ((s, d) => ensemble(s, d)),
  )

  /** Deliberately empty — none of the spam queries is SQL-expressible.
    * spam_train is a SEQUENTIAL SGD fold (each instance's gradient step
    * depends on all prior steps in shuffled order, reference protocol):
    * no set-oriented SQL can replay it; correctness is the exact
    * scalar-fold match in SpamSpec. spam_apply/spam_ensemble score with
    * those trained weights, so they inherit the non-expressibility;
    * their end-to-end quality bar (AUC) is also spec-asserted. The
    * driver's rows-only check is the strongest available hard signal.
    */
  val oracles: Map[String, String] = Map()
}
