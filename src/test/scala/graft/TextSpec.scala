package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Text

class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("t").select(Text.tokenize(col("t")).as("w"))
      .head().getSeq[String](0)

  test("tokenizer matches reference semantics") {
    // util/Tokenizer.scala:8-12: lowercase, strip edge non-[a-z], drop empties
    assert(tok("Hello, World!") == Seq("hello", "world"))
    assert(tok("  123abc456 ...  ") == Seq("abc"))
    assert(tok("don't CAN'T") == Seq("don't", "can't")) // inner chars survive
    assert(tok("42 99!") == Seq.empty)                  // all-non-letter drops
    assert(tok("") == Seq.empty)
  }

  test("tokenizer output is idempotent under re-tokenization") {
    val words = tok("The Quick!! brown-fox's 12 jumps...")
    assert(words.flatMap(w => tok(w)) == words)
  }

  test("distinct-capped keeps first-100 tokens then dedups (PairsPMI.java:53-63)") {
    def word(i: Int) = s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val many = (0 until 150).map(word).mkString(" ")
    val got = Seq(many).toDF("t")
      .select(Text.tokenizeDistinctCapped(col("t")).as("w"))
      .head().getSeq[String](0)
    assert(got.size == 100 && got.head == word(0) && got.last == word(99))
    val dups = "a b a c b a"
    val got2 = Seq(dups).toDF("t")
      .select(Text.tokenizeDistinctCapped(col("t")).as("w"))
      .head().getSeq[String](0)
    assert(got2 == Seq("a", "b", "c"))
  }

  test("bigram relfreq sums to 1 per left word") {
    val rows = Text.bigramRelFreq(spark, sf)
      .groupBy("w1").agg(sum("relfreq").as("s")).collect()
    rows.foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-3))
  }

  test("pmi is symmetric and thresholded") {
    val rows = Text.pmiPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val m = rows.map(r => (r.getString(1), r.getString(0)) -> r.getAs[Double]("pmi")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("npairs") >= 10)
      // directed pairs: (x,y) and (y,x) have identical counts hence pmi
      assert(m((r.getString(0), r.getString(1))) == r.getAs[Double]("pmi"))
    }
  }

  // The registered stripe output is a canonical `k:v,...` string (the
  // driver gate can only hash atomic cells); parse it back for comparison.
  private def parseStripe(w1: String, stripe: String): Map[(String, String), Double] =
    stripe.split(',').map { kv =>
      val i = kv.lastIndexOf(':')
      (w1, kv.substring(0, i)) -> kv.substring(i + 1).toDouble
    }.toMap

  test("pmi stripes carry the same content as pmi pairs") {
    val pairs = Text.pmiPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val stripes = Text.pmiStripes(spark, sf).collect()
      .flatMap(r => parseStripe(r.getString(0), r.getString(1))).toMap
    assert(stripes == pairs)
    assert(pairs.nonEmpty)
  }

  test("stripes form carries the same content as pairs form") {
    val pairs = Text.bigramRelFreq(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("relfreq")).toMap
    val stripes = Text.bigramStripes(spark, sf).collect()
    val flat = stripes.flatMap(r => parseStripe(r.getString(0), r.getString(1))).toMap
    assert(flat == pairs)
  }

  test("stripe entries are key-sorted within each row") {
    Text.bigramStripes(spark, sf).collect().foreach { r =>
      val keys = r.getString(1).split(',').map(kv => kv.substring(0, kv.lastIndexOf(':')))
      assert(keys.toSeq == keys.toSeq.sorted, s"unsorted stripe for ${r.getString(0)}")
    }
  }

  test("token-level corpus inflation equals tokenize over text-level inflation") {
    // the shared scale-tier token memo claims exact equivalence with
    // tokenize(documentsInflated) — the property the big-tier index
    // builds (and their hash gates, whose oracles replay the TEXT-level
    // inflation) depend on
    Caches.releaseAll()
    try {
      val byTok = Text.tokensInflated(spark, sf, 4).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val byText = Tables.documentsInflated(spark, sf, 4)
        .select(col("doc_id"), Text.tokenize(col("text")).as("tokens")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(byTok == byText, "token-level inflation diverged from text-level")
      // and the perturbation is visible: every replica r > 0 ends in its
      // distinguishing token, replica 0 is the base verbatim
      byTok.foreach { case (id, toks) =>
        if (id % 4 != 0 && toks.nonEmpty)
          assert(toks.last == "zz" + "x" * (id % 4).toInt, s"doc $id missing replica token")
      }
    } finally Caches.releaseAll()
  }
}
