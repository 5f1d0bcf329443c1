package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's query registry. Each module exposes
  * `queries: Map[name -> (SparkSession, sfDir) => DataFrame]` and
  * `oracles: Map[name -> DuckDB SQL]` (omitted for non-SQL-expressible
  * operators, which get the driver's weaker rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.Relational.q6(spark, "/root/testdata/sf0.001", "1996")

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (relational.Relational.queries, relational.Relational.oracles),
      (text.Text.queries, text.Text.oracles),
      (text.Bpe.queries, text.Bpe.oracles),
      (ir.InvertedIndex.queries, ir.InvertedIndex.oracles),
      (ir.Hybrid.queries, ir.Hybrid.oracles),
      (dedup.Dedup.queries, dedup.Dedup.oracles),
      (sim.Similarity.queries, sim.Similarity.oracles),
      (sim.KMeans.queries, sim.KMeans.oracles),
      (analysis.TextAnalysis.queries, analysis.TextAnalysis.oracles),
      (analysis.Curation.queries, analysis.Curation.oracles),
      (analysis.Pii.queries, analysis.Pii.oracles),
      (events.Events.queries, events.Events.oracles),
      (events.Temporal.queries, events.Temporal.oracles),
      (graph.PageRank.queries, graph.PageRank.oracles),
      (graph.KCore.queries, graph.KCore.oracles),
      (ml.Spam.queries, ml.Spam.oracles),
      (ml.BatchLogit.queries, ml.BatchLogit.oracles),
      (ml.NaiveBayes.queries, ml.NaiveBayes.oracles),
      (ml.Ols.queries, ml.Ols.oracles),
      (multimodal.Multimodal.queries, multimodal.Multimodal.oracles),
      (streaming.Streaming.queries, streaming.Streaming.oracles),
      (functions.LogSumExp.queries, functions.LogSumExp.oracles),
      (functions.MisraGries.queries, functions.MisraGries.oracles),
      (functions.CountMin.queries, functions.CountMin.oracles),
      (functions.GroupTopK.queries, functions.GroupTopK.oracles),
      (operators.Skew.queries, operators.Skew.oracles),
      (operators.RuntimeFilter.queries, operators.RuntimeFilter.oracles),
      (operators.Layout.queries, operators.Layout.oracles),
      (operators.Compact.queries, operators.Compact.oracles),
      (operators.Maintenance.queries, operators.Maintenance.oracles),
      (sources.Tbl.queries, sources.Tbl.oracles),
      (sources.Jsonl.queries, sources.Jsonl.oracles),
      (sources.Bucketed.queries, sources.Bucketed.oracles),
      (sources.Partitioned.queries, sources.Partitioned.oracles),
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
