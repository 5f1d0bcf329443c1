package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{Curation, PackDoc}
import graft.operators.Skew

/** Property tests for the round-3 operator rewrites on RANDOM inputs (the
  * fixture-based oracles pin one dataset; these pin the algebra):
  * salted join ≡ plain join for any salt width, and next-fit packing
  * invariants under arbitrary document length distributions.
  */
class OperatorPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals the plain join on random key distributions") {
    import spark.implicits._
    // skewed probe: 80% of rows on a handful of hot keys
    val probeGen = Gen.listOfN(400, Gen.frequency(
      4 -> Gen.chooseNum(0L, 2L), 1 -> Gen.chooseNum(0L, 50L))
      .flatMap(k => Gen.chooseNum(1, 100).map(v => (k, v))))
    val buildGen = Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 50L), Gen.alphaStr))
    for (salts <- Seq(1, 3, 16)) {
      val probe = probeGen.sample.get.toDF("k", "v")
      val build = buildGen.sample.get.distinctBy(_._1).toDF("k", "tag")
      val plain = probe.join(build, "k")
        .groupBy(col("k"), col("tag")).agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      val salted = Skew.saltedJoin(probe, build, "k", salts)
        .groupBy(col("k"), col("tag")).agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"salted($salts) != plain")
      // the duplicate-spreading opt-in re-salts rows but must leave the
      // join result untouched (any salt assignment is result-equivalent)
      val spread = Skew.saltedJoin(probe, build, "k", salts, spreadDuplicates = true)
        .groupBy(col("k"), col("tag")).agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      assert(spread.exceptAll(plain).isEmpty && plain.exceptAll(spread).isEmpty,
        s"spread-salted($salts) != plain")
    }
  }

  test("distributed shard packing equals a local sequential replay") {
    import spark.implicits._
    val cap = 48L
    val docs = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0, 7), Gen.chooseNum(1L, 70L))).sample.get
      .zipWithIndex
      .map { case ((bkt, n), i) => PackDoc(bkt, i.toLong, n) }
    val got = Curation.packShards(docs.toDS().repartition(5), cap)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("bucket"), r.getAs[Long]("bin_id")))
      .toMap
    // independent local replay of the next-fit recurrence per shard
    val expect = docs.groupBy(_.bucket).flatMap { case (bkt, ds) =>
      var bin = 0L; var fill = 0L
      ds.sortBy(_.doc_id).map { d =>
        if (fill > 0 && fill + d.n > cap) { bin += 1; fill = d.n } else fill += d.n
        d.doc_id -> (bkt.toLong, bin)
      }
    }.toMap
    assert(got == expect)
  }
}
