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

  test("strict registry tier: mixed-case counted once, decoy IPs not at all") {
    val rows = Pii.scanStrict(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ips"))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, (e, p, ip)) =>
      assert(e == (if (id % 5 == 0) 1L else 0L), s"doc $id strict email $e")
      assert(p == (if (id % 7 == 0) 1L else 0L), s"doc $id strict phone $p")
      // exactly the VALID IP; the 999.999.999.x decoy must stay uncounted
      assert(ip == (if (id % 11 == 0) 1L else 0L), s"doc $id strict ip $ip")
    }
  }

  test("strict tier: mixed-case emails match, out-of-range IPs do not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at User@Example.COM today"),      // mixed-case email
      (2L, "bogus addr 999.999.999.999 here"),         // out-of-range octets
      (3L, "server at 192.168.1.254 responded"),       // valid IP
      (4L, "release v1.2.3.4000 shipped"),             // version-like, last octet too big
      (5L, "plain clean text with no identifiers"),
      (6L, "edge 255.255.255.255 and 0.0.0.0 both real"))
      .toDF("doc_id", "text")
    val strict = Pii.scanOn(docs, strict = true).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_ips"))).toMap
    assert(strict(1L)._1 == 1L, "case-insensitive email must match")
    assert(strict(2L)._2 == 0L, "999.999.999.999 must not match strict IP")
    assert(strict(3L)._2 == 1L, "valid IP must match strict IP")
    assert(strict(4L)._2 == 0L, "1.2.3.4000 must not match strict IP")
    assert(strict(5L) == (0L, 0L), "clean text must stay clean")
    assert(strict(6L)._2 == 2L, "octet extremes 255/0 are in range")

    // the fixture tier misses the mixed-case email — the documented gap
    // the strict tier exists to close
    val fixture = Pii.scanOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_emails")).toMap
    assert(fixture(1L) == 0L, "fixture tier is lowercase-only by contract")

    // strict redaction rewrites the mixed-case span and leaves the bogus
    // IP untouched; a strict re-scan of the rewrite is clean
    val red = docs.select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        lit(Pii.EmailReStrict), lit("<EMAIL>")),
        lit(Pii.PhoneRe), lit("<PHONE>")),
        lit(Pii.IpReStrict), lit("<IP>")).as("text"))
    assert(Pii.scanOn(red, strict = true).where(col("has_pii")).count() == 0L)
    val marks = red.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(marks(1L).contains("<EMAIL>"))
    assert(marks(2L).contains("999.999.999.999"), "bogus IP must survive")
    assert(marks(3L).contains("<IP>"))
    val n = Pii.redactOn(docs, strict = true)
      .agg(sum(col("n_redacted"))).head.getLong(0)
    assert(n == 4L, s"strict redaction count $n != 4 (email + 3 real IPs)")
  }

  test("Luhn fold validates the known test vector and rejects its neighbors") {
    // 4539578763621486: doubled odd positions sum 37, plain even sum 43,
    // total 80 ≡ 0 (mod 10) — a hand-checked valid number
    def valid(card: String): Boolean =
      spark.sql(
        s"SELECT ${Pii.luhnSum(s"'$card'", 16, spark = true)} % 10 = 0 AS ok")
        .head.getBoolean(0)
    assert(valid("4539578763621486"))
    // flipping the check digit to any other value must fail
    assert((0 to 9).count(d => valid("453957876362148" + d)) == 1)
  }
}
