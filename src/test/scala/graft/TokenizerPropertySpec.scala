package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property-based fidelity of the tokenizer against a scalar
  * reimplementation of the reference semantics
  * (`util/Tokenizer.scala:8-12`: whitespace split, lowercase, strip
  * leading/trailing non-[a-z], drop empties). One Spark job evaluates a
  * whole generated batch.
  */
class TokenizerPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scalar reference tokenizer. */
  private def referenceTokenize(line: String): Seq[String] =
    line.toLowerCase.split("\\s+").toSeq
      .map(_.replaceAll("(^[^a-z]+|[^a-z]+$)", ""))
      .filter(_.nonEmpty)

  private val asciiLine: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaLowerChar, 2 -> Gen.alphaUpperChar,
      2 -> Gen.numChar, 2 -> Gen.oneOf(' ', ' ', '.', ',', '!', '-', '\''),
      1 -> Gen.oneOf('\t', '"', '(', ')'))).map(_.mkString)

  test("tokenize matches the reference semantics on generated lines") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val samples = Gen.listOfN(300, asciiLine).sample.get :+
      "" :+ "   " :+ "123 456" :+ "a" :+ "-a-" :+ "''x''  Y2K2"
    val got = samples.toDF("text")
      .select(col("text"), graft.text.Text.tokenize(col("text")).as("toks"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[String]](1).toSeq)
    got.foreach { case (line, toks) =>
      assert(toks == referenceTokenize(line), s"line=<$line>")
    }
  }

  test("tokenizer output starts/ends with a letter and is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val samples = Gen.listOfN(200, asciiLine).sample.get
    val toks = samples.toDF("text")
      .select(explode(graft.text.Text.tokenize(col("text"))).as("w"))
      .collect().map(_.getString(0))
    toks.foreach { w =>
      // reference strips only EDGE non-letters — interior digits/marks
      // survive (e.g. "don't"), so the invariant is letter-bounded
      assert(w.matches("^[a-z]([\\s\\S]*[a-z])?$"), s"token <$w>")
      assert(referenceTokenize(w) == Seq(w), s"not idempotent: <$w>")
    }
  }
}
