package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-14 surface: C4-style line-level dedup (dedup_lines) and the
  * trained char-trigram NB language ID (ta_langid_nb).
  */
class LineLangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dedupLinesOn removes planted shared lines, keeps unique ones, in order") {
    import spark.implicits._
    // doc 1: header + two unique lines + footer; doc 2: header + one
    // unique line + footer; doc 3: ONLY shared lines (header+footer) —
    // the all-removed edge (kept text must hash as the empty string)
    val docs = Seq(
      (1L, "HDR\nalpha beta\ngamma delta\nFTR"),
      (2L, "HDR\nepsilon zeta\nFTR"),
      (3L, "HDR\nFTR")).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.dedupLinesOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L) === ((4L, 2L, md5hex("alpha beta\ngamma delta"))))
    assert(out(2L) === ((3L, 2L, md5hex("epsilon zeta"))))
    assert(out(3L) === ((2L, 2L, md5hex(""))))
  }

  test("dedupLinesOn counts distinct DOCS, not occurrences, toward minDocs") {
    import spark.implicits._
    // "dup" appears twice in doc 1 but in no other doc: one document,
    // so it survives a minDocs=2 gate (C4 removes cross-document
    // boilerplate, not in-document repetition)
    val docs = Seq(
      (1L, "dup\nmiddle\ndup"),
      (2L, "other")).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.dedupLinesOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L) === ((3L, 0L, md5hex("dup\nmiddle\ndup"))))
    assert(out(2L) === ((1L, 0L, md5hex("other"))))
  }

  test("linesFixture gate: header always removed, fixture replays deterministically") {
    val fx = graft.dedup.Dedup.dedupLinesOn(
      graft.dedup.Dedup.linesFixture(spark, sf))
    val rows = fx.collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length === nDocs)
    // the corpus-wide header and the mod-5 footer (every residue class
    // is populated at fixture size) are removed from every doc
    assert(rows.forall(_.getLong(2) >= 2L))
    // and nothing removes a whole fixture doc: the interior carries
    // doc-unique fragments for at least some docs
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("ta_langid_nb: per-language accuracy over the labeled corpus") {
    val out = graft.ml.NaiveBayes.langIdNb(spark, sf)
    val rows = out.collect()
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(rows.length === langs)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1))
      val acc = r.getDouble(3)
      assert(acc >= 0.0 && acc <= 1.0)
      val expected = BigDecimal(r.getLong(2).toDouble / r.getLong(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(acc - expected) < 1e-9)
    }
  }
}
