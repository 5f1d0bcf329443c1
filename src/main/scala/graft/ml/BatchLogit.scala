package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.Text

/** Batch-gradient logistic regression — the SET-ORIENTED counterpart of
  * [[Spam]]'s sequential SGD fold (driver-extension). Where SGD's
  * per-instance recurrence has no SQL form, full-batch gradient descent
  * is nothing but joins and grouped sums, so the whole training run is
  * oracle-replayable (chained CTEs, like sim_kmeans / pr_toprank).
  *
  * Protocol (deterministic, engine-portable):
  *  - instances: label = doc contains "spark"; feature ids =
  *    md5-derived token hashes mod [[NumFeatures]] (md5, not xxhash64,
  *    exactly so the oracle can re-derive them), one id PER OCCURRENCE;
  *  - iterate [[Iterations]] times: weights live in DECIMAL(18,6), so
  *    score_d = Σ w(f) is an EXACT, order-independent decimal sum;
  *    prob_d = sigmoid(score_d as double) rounded to 6 dp and cast back
  *    to DECIMAL(9,6); the gradient Σ (label_d − prob_d) is again exact
  *    decimal; w += [[Eta]] · grad, decimal-rounded to 6 dp.
  *
  * Why DECIMAL: Eta = 0.5 times a 6-dp-grid gradient puts every update
  * EXACTLY on a half-tie at the 7th digit, and double rounding modes
  * differ across engines precisely at ties (observed as a 1-digit
  * weight mismatch at sf0.01). Decimal addition is exact and
  * associative — summation order stops mattering — and both Spark
  * (HALF_UP) and DuckDB round decimal ties away from zero identically.
  * Only the sigmoid runs in double, on a bit-identical input.
  *
  * Scale shape: the corpus-sized scan happens ONCE, building the
  * occurrence-count compression (see [[compressed]]) — the per-iteration
  * score/gradient aggregations then run over the cached deduplicated
  * (docid, feature, cnt) table, smaller than the raw occurrence stream
  * by the token-duplication factor. The weight table never touches the
  * driver: it stays a (feature, w) DataFrame across iterations — seeded
  * distributively, updated by a feature-keyed join with the gradient —
  * so an open-vocabulary feature space only has to fit an EXECUTOR
  * partition, not driver heap. The one place the model is collected is
  * the `broadcast()` at the scoring join, where any model small enough
  * to broadcast must fit by definition; at a feature dimension past
  * broadcast range that hint is the single line to drop (the join
  * degrades to a shuffle join, the rest of the loop is unchanged).
  */
object BatchLogit {
  val Eta = BigDecimal("0.5")
  val Iterations = 8
  val NumFeatures = 1000

  /** Exploded training table: (docid, label, feature) — one row per
    * token OCCURRENCE. conv(md5-prefix) is codegen'd and replayable in
    * any engine with md5.
    */
  def occurrences(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", Text.tokenize(col("text")))
      .select(
        col("doc_id").as("docid"),
        when(array_contains(col("toks"), "spark"), 1).otherwise(0).as("label"),
        explode(col("toks")).as("w"))
      .select(col("docid"), col("label"),
        (expr("CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)") % NumFeatures)
          .as("feature"))

  /** Occurrence-count compression of [[occurrences]]: one row per
    * DISTINCT (docid, feature) with its multiplicity. Exact and lossless
    * for the protocol: Σ_occurrences w(f) = Σ_distinct cnt·w(f) and
    * Σ_occurrences (label − prob) = Σ_distinct cnt·(label − prob),
    * because an integer count times a decimal is an exact decimal. Every
    * per-iteration shuffle then moves the deduplicated table (smaller by
    * the token-duplication factor) instead of the raw occurrence table.
    */
  def compressed(spark: SparkSession, dir: String): DataFrame =
    occurrences(spark, dir)
      .groupBy(col("docid"), col("label"), col("feature"))
      .agg(count(lit(1)).as("cnt"))

  /** Run the loop; returns the trained weight table (feature, weight).
    *
    * The compressed table is cached unpartitioned: at 1000-executor
    * scale, pre-partitioning it by docid would make the score aggregate
    * and the gradient join exchange-free (one feature-keyed shuffle per
    * iteration), but measured locally that layout pushes AQE into
    * re-broadcasting the corpus-sized side every iteration (5 s → 16 s
    * at sf0.1), so the shipped form lets AQE plan each iteration's two
    * small shuffles instead.
    */
  def train(spark: SparkSession, dir: String, iterations: Int = Iterations): DataFrame = {
    val ex = graft.Caches.memoized(spark, dir, "ml:gd_compressed")(compressed(spark, dir))
    // w0 = 0 for every feature that occurs — derived distributively; the
    // feature dimension is never collect()ed (r5 verdict ask 4)
    val w0 = ex.select(col("feature")).distinct()
      .withColumn("w",
        lit(new java.math.BigDecimal("0.000000")).cast("decimal(18,6)"))
      .localCheckpoint(eager = false)
    // ONE lazy plan for the whole training run (the pr_hits protocol):
    // the weight frame is referenced twice per iteration, so the
    // harness's lazy localCheckpoint cut is what keeps the plan bounded
    // AND each round's model computed once; the r9 eager form paid eight
    // count() actions plus their scheduling. Both the model and the
    // per-doc score frame are BROADCAST into their joins — checkpointed
    // leaves have no stats, so the unhinted plan re-sorted the
    // corpus-sized compressed table per iteration for SortMergeJoins.
    // The model broadcast is valid by definition (a model too big to
    // broadcast has no business in full-batch GD); the SCORE broadcast
    // is tier-bound (per-doc rows — drop that one hint at corpus scale
    // and the gradient join degrades to the shuffle join, rest unchanged).
    val trained = graft.graph.IterativeLoop.fixedBudget(w0, iterations) { (w, _) =>
      val scored = ex.join(broadcast(w), "feature")
        .groupBy(col("docid"), col("label"))
        .agg(sum(col("cnt") * col("w")).as("score")) // exact decimal sum, order-free
        .withColumn("prob",
          round(lit(1.0) / (lit(1.0) + exp(-col("score").cast("double"))), 6)
            .cast("decimal(9,6)"))
      val grad = ex.join(broadcast(scored.select(col("docid"), col("prob"))), "docid")
        .groupBy(col("feature"))
        .agg(sum(col("cnt") * (col("label") - col("prob"))).as("g")) // exact decimal sum
        // narrow BEFORE the Eta product: the wide sum type (38,6) times
        // 0.5 would trip Spark's precision-loss scale reduction; at
        // (18,6) the product keeps its exact scale-7 value, and
        // pre-rounding x to 6 dp commutes with round(w + x, 6) because w
        // already sits on the 6-dp grid and both engines round HALF_UP
        .select(col("feature"), col("g").cast("decimal(18,6)").as("g"))
      // every w-feature occurs in ex, so the gradient join is inner —
      // exactly the oracle's `w JOIN g USING (feature)`
      w.join(grad, Seq("feature"))
        .select(col("feature"),
          round(col("w") + lit(Eta.bigDecimal) * col("g"), 6)
            .cast("decimal(18,6)").as("w"))
    }
    // the returned plan is the lazy chain's head; the model never
    // touches the driver unless the CALLER broadcasts or writes it
    trained.select(col("feature"), col("w").cast("double").as("weight"))
  }

  // ---------------------------------------------------------------- oracle

  private val tokSql =
    graft.text.Text.TokSql

  /** Chained-CTE replay of the full training run. */
  private def gdOracle(iterations: Int): String = {
    val sb = new StringBuilder(
      s"""WITH inst AS MATERIALIZED (
            SELECT doc_id AS docid,
                   CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END AS label,
                   unnest(list_transform(toks,
                     w -> ('0x' || substr(md5(w), 1, 8))::BIGINT % $NumFeatures)) AS feature
            FROM (SELECT doc_id, $tokSql AS toks FROM documents)),
          w0 AS MATERIALIZED (
            SELECT DISTINCT feature, CAST(0.000000 AS DECIMAL(18,6)) AS w FROM inst)""")
    for (i <- 1 to iterations) sb ++=
      s""",
          sc$i AS MATERIALIZED (
            SELECT docid, label,
                   CAST(round(1.0 / (1.0 + exp(-CAST(score AS DOUBLE))), 6) AS DECIMAL(9,6)) AS prob
            FROM (SELECT i.docid, i.label, sum(ww.w) AS score
                  FROM inst i JOIN w${i - 1} ww USING (feature)
                  GROUP BY i.docid, i.label)),
          g$i AS MATERIALIZED (
            SELECT i.feature, sum(sc.label - sc.prob) AS g
            FROM inst i JOIN sc$i sc USING (docid)
            GROUP BY i.feature),
          w$i AS MATERIALIZED (
            SELECT ww.feature, CAST(round(ww.w + 0.5 * g.g, 6) AS DECIMAL(18,6)) AS w
            FROM w${i - 1} ww JOIN g$i g USING (feature))"""
    sb ++= s"""
          SELECT feature, CAST(w AS DOUBLE) AS weight FROM w$iterations"""
    sb.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_batch_gd" -> ((s, d) => train(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "ml_batch_gd" -> gdOracle(Iterations),
  )
}
