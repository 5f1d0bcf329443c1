package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import graft.dedup.Dedup

/** AQE skew-join cross-check (r7 verdict ask 8): the sk_* rows prove
  * MANUAL salting exact; this spec proves when salting is UNNECESSARY on
  * modern Spark — `spark.sql.adaptive.skewJoin` detects the fat-input
  * partition of the dedup skew corpus's hottest boilerplate shingle,
  * splits it, and produces the identical result. Findings recorded in
  * operators/Skew.scala's saltedJoin doc:
  *  1. a broadcastable build side makes skew moot (disabled here to
  *     force the shuffle join AQE must repair);
  *  2. OptimizeSkewedJoin only matches SMJ(Sort(Shuffle), Sort(Shuffle))
  *     — an aggregate between the build's shuffle and the join defeats
  *     it silently (hence the RDD barrier below);
  *  3. the detector is COMPRESSED-bytes-based: a skewed key whose rows
  *     are low-entropy (the raw hash column alone compresses ~100×)
  *     can hide below the thresholds — and output-side skew (the
  *     inverted-index self-join's C(df,2) blowup) is invisible to it
  *     entirely, which is why the df cap, not AQE, guards the ngram
  *     join.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** The skew-corpus probe with its single hottest shingle key
    * replicated ×40 — the sf0.1 gate corpus's hot-key density replayed
    * deterministically at fixture scale (the inflation pattern the skew
    * corpus itself uses). `payload` is a high-entropy per-row value
    * that survives column pruning into the shuffle (finding #3: an
    * all-duplicates hot partition compresses away below the detector's
    * thresholds; real probe rows carry real attributes).
    */
  private def skewedProbe(s: SparkSession, dft: DataFrame): DataFrame = {
    val ex = Dedup.skewIndex(s, sf)
    val hot = dft.orderBy(desc("df"), col("s")).limit(1).select(col("s").as("hs"))
    ex.join(broadcast(hot), col("s") === col("hs"), "left")
      .select(col("doc_id"), col("s"), col("sl"),
        explode(sequence(lit(0),
          when(col("hs").isNotNull, lit(39)).otherwise(lit(0)))).as("r"))
      .select(col("s"),
        pmod(xxhash64(col("doc_id"), col("s"), col("sl"), col("r")), lit(1000000L))
          .as("payload"))
      // finding #4: AQE splits a skewed partition at MAPPER granularity —
      // the fixture's one-split parquet scan gives the join shuffle a
      // single map task, and a one-mapper partition can never be split
      // (production scans have thousands of mappers; this repartition
      // restores that property at fixture scale)
      .repartition(8)
  }

  private def volumes(probe: DataFrame, build: DataFrame): Set[(Long, Long, Long)] =
    probe.join(build, Seq("s"))
      .groupBy(col("df")).agg(count(lit(1)).as("n"), sum(col("payload")).as("chk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("AQE skew-join splits the hot-key partition and equals the manual salted join") {
    // session-scoped AQE tuning: thresholds scaled to the fixture corpus
    // the same way shuffle.partitions=32 scales the prod session to
    // local[32] (the detector is bytes-proportional — production keeps
    // the defaults; only magnitudes shrink here)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
    // a coalesced post-shuffle read would merge the small partitions and
    // shift the median; keep the geometry fixed so the test pins the
    // SPLIT decision, not the coalesce interplay
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // finding #1: left alone Spark BROADCASTS the small build side and
    // skew never arises; disabled to force the shuffle join
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "16")

    val dft = Dedup.skewIndex(s2, sf).groupBy(col("s")).agg(count(lit(1)).as("df"))
    val probe = skewedProbe(s2, dft)
    // finding #2: RDD barrier — OptimizeSkewedJoin only matches
    // SMJ(Sort(Shuffle), Sort(Shuffle)); with the df AGGREGATE between
    // the build's shuffle and the join the pattern fails silently
    val build = s2.createDataFrame(dft.rdd, dft.schema)

    val joined = probe.join(build, Seq("s"))
      .groupBy(col("df")).agg(count(lit(1)).as("n"), sum(col("payload")).as("chk"))
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // the optimizer really did the repair: the final adaptive plan holds
    // a shuffle join marked isSkewJoin
    val adaptive = joined.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a
    }.getOrElse(fail("no adaptive plan — AQE disabled?"))
    // QueryStageExec wrappers are LEAF nodes — plain collect() stops at
    // the ResultQueryStage root; walk across stage boundaries explicitly
    def deep(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val through = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ through).flatMap(deep)
    }
    val nodes = deep(adaptive.executedPlan)
    val stageSizes = nodes.collect {
      case sq: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
        s"stage ${sq.id}: ${sq.mapStats.map(_.bytesByPartitionId.mkString(",")).getOrElse("none")}"
    }.mkString("\n")
    val skewJoins = nodes.collect {
      case j: SortMergeJoinExec if j.isSkewJoin => j
      case j: ShuffledHashJoinExec if j.isSkewJoin => j
    }
    assert(skewJoins.nonEmpty,
      s"AQE did not split the skewed join; sizes:\n$stageSizes\n${adaptive.executedPlan}")

    // identical numbers three ways: AQE-split == manual salted == plain.
    // saltedJoin's content salt spreads the hot key's 1500 distinct
    // source rows over 8 reducers (its documented contract)
    val salted = graft.operators.Skew.saltedJoin(probe, build, "s", salts = 8)
      .groupBy(col("df")).agg(count(lit(1)).as("n"), sum(col("payload")).as("chk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == salted, "AQE-split join drifted from the manual salted join")

    val s3 = spark.newSession()
    s3.conf.set("spark.sql.adaptive.enabled", "false")
    val dft3 = Dedup.skewIndex(s3, sf).groupBy(col("s")).agg(count(lit(1)).as("df"))
    val want = volumes(skewedProbe(s3, dft3), dft3)
    assert(got == want, "AQE-split join drifted from the plain join")
    assert(got.nonEmpty)
  }
}
