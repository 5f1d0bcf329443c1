package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Pii

class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("scan: injected docs detected per kind, clean docs all-zero") {
    val rows = Pii.scan(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ips"), r.getAs[Boolean]("has_pii"))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, (e, p, ip, has)) =>
      assert(e == (if (id % 5 == 0) 1L else 0L), s"doc $id email count $e")
      assert(p == (if (id % 7 == 0) 1L else 0L), s"doc $id phone count $p")
      assert(ip == (if (id % 11 == 0) 1L else 0L), s"doc $id ip count $ip")
      assert(has == (e + p + ip > 0), s"doc $id has_pii flag")
    }
    // the fixture must exercise both positive and negative rows
    assert(rows.values.exists(_._4) && rows.values.exists(!_._4))
  }

  test("redact: placeholders replace every span; re-scan finds nothing") {
    // rebuild the redacted text the operator hashes, then prove a second
    // scan over it is clean and the placeholders appear exactly where
    // the injection put PII
    val red = Pii.injected(spark, sf).select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        lit(Pii.EmailRe), lit("<EMAIL>")),
        lit(Pii.PhoneRe), lit("<PHONE>")),
        lit(Pii.IpRe), lit("<IP>")).as("text"))
    val rescan = Pii.scanOn(red).where(col("has_pii")).count()
    assert(rescan == 0L, s"$rescan docs still carry PII after redaction")
    val marks = red.select(col("doc_id"),
      (col("text").contains("<EMAIL>")).as("e"),
      (col("text").contains("<PHONE>")).as("p"),
      (col("text").contains("<IP>")).as("i")).collect()
    marks.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("e") == (id % 5 == 0), s"doc $id email mark")
      assert(r.getAs[Boolean]("p") == (id % 7 == 0), s"doc $id phone mark")
      assert(r.getAs[Boolean]("i") == (id % 11 == 0), s"doc $id ip mark")
    }
    // n_redacted agrees with the scan totals
    val n = Pii.redact(spark, sf).agg(sum(col("n_redacted"))).head.getLong(0)
    val m = Pii.scan(spark, sf)
      .agg(sum(col("n_emails") + col("n_phones") + col("n_ips"))).head.getLong(0)
    assert(n == m, s"redaction count $n != scan count $m")
  }
}
