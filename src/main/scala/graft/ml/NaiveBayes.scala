package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.Text

/** Multinomial Naive Bayes over the `documents` table (lang as the
  * class label) — the counting-based classifier family next to the
  * gradient ones ([[Spam]] sequential SGD, [[BatchLogit]] batch GD).
  * No reference counterpart (its only classifier is the SGD spam model);
  * extension mandate: language-ID / topic routing is the classic
  * curation-pipeline classifier, and NB is pure relational algebra —
  * token counts, one ln per (class, token) cell, exact-decimal score
  * sums — so train AND apply are fully oracle-replayable.
  *
  * Determinism contract (the perplexity/kn_score technique):
  * per-cell log-likelihoods ln((cnt+1)/(total_c+V)) are ln on exact
  * integers (bit-identical across engines), rounded to 6 dp and cast to
  * DECIMAL(18,6); document scores are then EXACT decimal sums
  * prior + Σ tf·loglik (tf integer), so summation order — and therefore
  * partitioning — cannot change a single bit. Argmax tie-breaks on lang
  * ascending.
  *
  * Scale shape: one corpus scan builds per-(class, token) counts (a
  * vocabulary-sized aggregate); the model grid is V×C rows — broadcast
  * weight, exactly how a 100-TB NB deploy ships its model. Apply joins
  * the per-doc tf relation (corpus-sized, keyed by token) against the
  * broadcast grid and aggregates by doc — one shuffle on doc_id. The
  * per-doc argmax window partitions on doc_id (high cardinality, never
  * a global sort).
  */
object NaiveBayes {

  /** (doc_id, lang, w, tf) — per-document token frequencies. */
  private def docTf(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(Text.tokenize(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("lang"), col("w"))
      .agg(count(lit(1)).as("tf"))

  /** The smoothed model grid: every (lang, token) cell of V×C, with its
    * occurrence count (0 for unseen) and add-1-smoothed log-likelihood,
    * plus the per-class document-count log-prior replicated per row
    * (keeps the model a single relation).
    */
  def nbModel(spark: SparkSession, dir: String): DataFrame = {
    val tf = graft.Caches.memoized(spark, dir, "ml:nb_tf")(docTf(spark, dir))
    val cellCnt = tf.groupBy(col("lang"), col("w"))
      .agg(sum(col("tf")).as("cnt"))
    val classTotal = cellCnt.groupBy(col("lang"))
      .agg(sum(col("cnt")).as("total"))
    val vocab = cellCnt.select(col("w")).distinct()
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val docs = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    classTotal.crossJoin(vocab)
      .join(cellCnt, Seq("lang", "w"), "left_outer")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(vsize))
      .join(broadcast(docs.crossJoin(nDocs)), Seq("lang"))
      .select(col("lang"), col("w").as("token"), col("cnt"),
        expr("""CAST(round(ln(CAST(cnt + 1 AS DOUBLE) / CAST(total + v AS DOUBLE)), 6)
                AS DECIMAL(18,6))""").as("loglik"),
        expr("""CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                AS DECIMAL(18,6))""").as("logprior"))
  }

  /** Registry form of the model: doubles for the hash gate. */
  def train(spark: SparkSession, dir: String): DataFrame =
    nbModel(spark, dir).select(col("lang"), col("token"), col("cnt"),
      col("loglik").cast("double").as("loglik"),
      col("logprior").cast("double").as("logprior"))

  /** Classify every document with the model trained on the same corpus
    * (the closed-vocabulary resubstitution gate — OOV handling is the
    * grid's own smoothing, exercised by every (class, token) cell the
    * class never saw). Output: predicted vs actual label and the exact
    * winning score.
    */
  def apply_(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = graft.Caches.memoized(spark, dir, "ml:nb_tf")(docTf(spark, dir))
    val model = nbModel(spark, dir)
      .select(col("lang").as("cand"), col("token").as("w"),
        col("loglik"), col("logprior"))
    val scored = tf.join(broadcast(model), Seq("w"))
      .groupBy(col("doc_id"), col("lang"), col("cand"))
      .agg((first(col("logprior")) +
        sum(col("tf") * col("loglik"))).as("score"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("cand"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("actual"), col("cand").as("predicted"),
        (col("cand") === col("lang")).as("correct"),
        col("score").cast("double").as("score"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_nb_train" -> ((s, d) => train(s, d)),
    "ml_nb_apply" -> ((s, d) => apply_(s, d)),
  )

  private val tokSql =
    """list_filter(list_transform(string_split_regex(text, '\s+'),
       w -> regexp_replace(lower(w), '(^[^a-z]+|[^a-z]+$)', '', 'g')),
       w -> w <> '')"""

  private val modelSql =
    s"""WITH tok AS (SELECT doc_id, lang, unnest($tokSql) AS w FROM documents),
        tf AS (SELECT doc_id, lang, w, count(*) AS tf FROM tok GROUP BY doc_id, lang, w),
        cell AS (SELECT lang, w, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY lang, w),
        ct AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS total FROM cell GROUP BY lang),
        vocab AS (SELECT DISTINCT w FROM cell),
        vs AS (SELECT count(*) AS v FROM vocab),
        dc AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        nd AS (SELECT count(*) AS n FROM documents),
        grid AS (SELECT ct.lang, vocab.w, coalesce(cell.cnt, 0) AS cnt, ct.total
                 FROM ct CROSS JOIN vocab
                 LEFT JOIN cell ON cell.lang = ct.lang AND cell.w = vocab.w)
        SELECT grid.lang, grid.w AS token, grid.cnt,
          CAST(round(ln(CAST(grid.cnt + 1 AS DOUBLE) / CAST(grid.total + v AS DOUBLE)), 6)
               AS DECIMAL(18,6)) AS loglik,
          CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               AS DECIMAL(18,6)) AS logprior
        FROM grid CROSS JOIN vs JOIN dc ON dc.lang = grid.lang CROSS JOIN nd"""

  val oracles: Map[String, String] = Map(
    "ml_nb_train" ->
      s"""SELECT lang, token, cnt, CAST(loglik AS DOUBLE) AS loglik,
            CAST(logprior AS DOUBLE) AS logprior
          FROM ($modelSql)""",
    "ml_nb_apply" ->
      s"""WITH model AS ($modelSql),
          tok AS (SELECT doc_id, lang, unnest($tokSql) AS w FROM documents),
          tf AS (SELECT doc_id, lang, w, count(*) AS tf FROM tok GROUP BY doc_id, lang, w),
          sc AS (SELECT tf.doc_id, tf.lang, model.lang AS cand,
                   any_value(model.logprior) + sum(tf.tf * model.loglik) AS score
                 FROM tf JOIN model ON tf.w = model.token
                 GROUP BY tf.doc_id, tf.lang, model.lang)
          SELECT doc_id, lang AS actual, cand AS predicted,
            cand = lang AS correct, CAST(score AS DOUBLE) AS score
          FROM (SELECT *, row_number() OVER
                  (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
                FROM sc)
          WHERE rn = 1""",
  )
}
