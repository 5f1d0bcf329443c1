package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Bpe, Text}
import org.apache.spark.sql.functions.col

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Independent scalar reference: tokenize + count + train with idiomatic
    * collections (sliding pairs, groupBy), no shared code with the
    * distributed path beyond the published protocol.
    */
  private def referenceMerges(texts: Seq[String], numMerges: Int): Seq[(String, String)] = {
    val words = texts.flatMap(_.toLowerCase.split("\\s+").toSeq
      .map(_.replaceAll("(^[^a-z]+|[^a-z]+$)", "")).filter(_.nonEmpty))
    var dict: Map[List[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => (w.map(_.toString).toList :+ Bpe.Eow) -> ws.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (out.length < numMerges && dict.keys.exists(_.length > 1)) {
      val counts = dict.toSeq.flatMap { case (syms, f) =>
        syms.sliding(2).collect { case List(a, b) => ((a, b), f) }
      }.groupBy(_._1).map { case (p, fs) => p -> fs.map(_._2).sum }
      val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
      out += best
      dict = dict.map { case (syms, f) =>
        // left-to-right non-overlapping pass as a fold: a just-merged
        // symbol (a+b) can never re-match as the left element since
        // a+b != a, so "merge with accumulator's last" == single scan
        val merged = syms.foldLeft(List.empty[String]) { (acc, s) =>
          if (acc.nonEmpty && acc.last == best._1 && s == best._2)
            acc.init :+ (best._1 + best._2)
          else acc :+ s
        }
        merged -> f
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    out.toSeq
  }

  test("distributed trainer equals the scalar reference on the fixture corpus") {
    val texts = Tables.documents(spark, sf).select("text").collect().map(_.getString(0)).toSeq
    val ref = referenceMerges(texts, 16)
    val dist = Bpe.trainOnCorpus(spark, sf, numMerges = 16)
    assert(dist == ref)
  }

  test("frozen merges provenance: FrozenMerges == trainOnCorpus(sf0.001, 48)") {
    val trained = Bpe.trainOnCorpus(spark, "/root/testdata/sf0.001", numMerges = 48)
    assert(Bpe.FrozenMerges == trained,
      s"\nfrozen:  ${Bpe.FrozenMerges}\ntrained: $trained")
  }

  test("encodeWord: lossless segmentation, empty-merge floor, monotone budget") {
    val words = Seq("the", "tokenizer", "a", "internationalization", "don't")
    words.foreach { w =>
      val subs = Bpe.encodeWord(w, Bpe.FrozenMerges)
      assert(subs.mkString.stripSuffix(Bpe.Eow) == w, s"lossy segmentation of $w")
      assert(Bpe.encodeWord(w, Nil) == w.map(_.toString) :+ Bpe.Eow)
      assert(subs.length <= w.length + 1)
    }
  }

  /** Replays [[Bpe.encodeWord]] through the exact string-replace scheme
    * the DuckDB oracle uses (chr(10)-prefixed, space-suffixed symbols;
    * one replace per merge) and asserts equality over every distinct
    * fixture word — proving the oracle's replace semantics match the
    * native symbol-scan pass.
    */
  test("oracle replay: replace-based encoding == mergePass encoding on all fixture words") {
    val words = Text.wordCount(spark, sf).select("word").collect().map(_.getString(0))
    words.foreach { w =>
      val seg0 = w.map(ch => s"\n$ch ").mkString + s"\n${Bpe.Eow} "
      val viaReplace = Bpe.FrozenMerges.foldLeft(seg0) { case (acc, (a, b)) =>
        acc.replace(s"\n$a \n$b ", s"\n$a$b ")
      }.split("\n").toIndexedSeq.drop(1).map(_.stripSuffix(" "))
      assert(viaReplace == Bpe.encodeWord(w, Bpe.FrozenMerges), s"divergence on word: $w")
    }
  }

  test("property: encode is lossless and replace-replayable for arbitrary words") {
    // the tokenizer guarantees words contain no whitespace; everything
    // else (digits, punctuation, unicode) may appear word-internally
    val gen = org.scalacheck.Gen.chooseNum(1, 24).flatMap(n =>
      org.scalacheck.Gen.listOfN(n,
        org.scalacheck.Gen.frequency(
          8 -> org.scalacheck.Gen.alphaLowerChar,
          2 -> org.scalacheck.Gen.oneOf('0', '9', '\'', '-', '<', '/', '>', 'é', 'ß'),
        )).map(_.mkString))
    val words = org.scalacheck.Gen.listOfN(500, gen).sample.get
    words.foreach { w =>
      val subs = Bpe.encodeWord(w, Bpe.FrozenMerges)
      assert(subs.mkString.stripSuffix(Bpe.Eow) == w, s"lossy on $w")
      val seg0 = w.map(ch => s"\n$ch ").mkString + s"\n${Bpe.Eow} "
      val viaReplace = Bpe.FrozenMerges.foldLeft(seg0) { case (acc, (a, b)) =>
        acc.replace(s"\n$a \n$b ", s"\n$a$b ")
      }.split("\n").toIndexedSeq.drop(1).map(_.stripSuffix(" "))
      assert(viaReplace == subs, s"replace divergence on $w")
    }
  }

  test("ta_bpe_encode: n_subwords consistent with per-word encoding") {
    val df = Bpe.encode(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), Text.tokenize(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    df.collect().foreach { r =>
      val expected = docs(r.getLong(0)).map(w => Bpe.encodeWord(w, Bpe.FrozenMerges).length).sum
      assert(r.getInt(1) == expected)
    }
  }
}
