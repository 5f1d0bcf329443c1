package graft

import org.scalatest.funsuite.AnyFunSuite

/** r13 verdict task 7: shared oracle-SQL fragments must be REFERENCED
  * from [[OracleSql]], never re-inlined — the TokSql consolidation
  * enforced for the next most-copied families. A new inline copy of any
  * of these idioms in a module's oracle string fails here, naming the
  * file, before it can drift from the shared definition.
  */
class OracleFragmentsSpec extends AnyFunSuite {

  private def mainSources: Seq[(String, String)] = {
    val root = java.nio.file.Paths.get("src/main/scala")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala"))
        out += p.toString -> new String(java.nio.file.Files.readAllBytes(p))
    }
    out.toSeq
  }

  private def onlyInOracleSql(fragment: String): Unit = {
    val offenders = mainSources.filter { case (path, text) =>
      text.contains(fragment) && !path.endsWith("OracleSql.scala")
    }.map(_._1)
    assert(offenders.isEmpty,
      s"inline copies of shared oracle fragment '${fragment.take(50)}…' in: " +
        offenders.mkString(", "))
  }

  test("L2-norm idiom lives only in OracleSql") {
    onlyInOracleSql("x -> x::DOUBLE * x::DOUBLE")
  }

  test("md5-bucket idiom lives only in OracleSql") {
    onlyInOracleSql("substring(md5(CAST(doc_id AS VARCHAR))")
  }

  test("trigram-shingle comprehension lives only in OracleSql") {
    // the comprehension form (distinct shingle SET); the positional
    // list_transform trigram in TextAnalysis.fingerprint is a different
    // operator (ordered, duplicates kept) and intentionally not shared
    onlyInOracleSql("[i] || ' ' || w[i+1]")
    onlyInOracleSql("[i] || ' ' || toks[i+1]")
  }

  private def onlyIn(owner: String, fragment: String): Unit = {
    val offenders = mainSources.filter { case (path, text) =>
      text.contains(fragment) && !path.endsWith(owner)
    }.map(_._1)
    assert(offenders.isEmpty,
      s"inline copies of shared oracle fragment '${fragment.take(50)}…' " +
        s"(owner $owner) in: " + offenders.mkString(", "))
  }

  test("quality decimal blend lives only in TextAnalysis.qualityCteSql") {
    // owner-module hoisting (the TokSql precedent): the quality replay
    // is owned by TextAnalysis, referenced by ta_quality and all three
    // curation-pipeline oracles plus st_curate
    onlyIn("TextAnalysis.scala",
      "abs(CAST(stop_ratio AS DECIMAL(8,6)) - CAST(0.1 AS DECIMAL(8,6)))")
  }

  test("incremental-ingestion CTE chain lives only in Dedup") {
    // the batch/corpus/ex/nr chain is owned by Dedup.incrementalCteBody;
    // st_curate's oracle must reference it, not inline a twin
    onlyIn("Dedup.scala", "JOIN corpus co ON c.doc_id = co.doc_id")
  }

  test("the shared definitions render the expected SQL") {
    assert(OracleSql.md5Bucket() ===
      "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100")
    assert(OracleSql.l2norm("e.x") ===
      "sqrt(list_sum(list_transform(e.x, x -> x::DOUBLE * x::DOUBLE)))")
    assert(OracleSql.cos6("a", "b").contains(OracleSql.l2norm("a")))
    assert(OracleSql.shingle3("w").contains("generate_series(1, len(w) - 2)"))
  }
}
