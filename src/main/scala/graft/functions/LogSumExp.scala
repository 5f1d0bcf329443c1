package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Numerically-stable log-sum-exp aggregation — SURVEY.md §2.4 A9, the
  * reference's log-domain mass accumulation
  * (`RunPersonalizedPageRankBasic.java:617-629` `sumLogProbs`:
  * max + log1p(exp(min − max)) pairwise).
  *
  * Two forms:
  *  - [[twoPass]]: a declarative 2-pass plan (group max, then
  *    sum(exp(x − max))) — both aggregates are partial+final
  *    HashAggregates, fully codegen'd, and the formula is reproducible in
  *    any SQL engine (the DuckDB oracle runs the identical shape);
  *  - [[LseAgg]]: a single-pass typed `Aggregator` with the streaming
  *    merge (rescale the smaller max's partial sum) — one shuffle instead
  *    of two, for use where the extra pass matters; fp-equivalent to
  *    ~1e-12 (asserted in spec), not bit-equal, so the oracle-checked
  *    query uses the 2-pass form.
  */
object LogSumExp {

  /** log(Σ exp(x)) per group, stable: max_g + log(Σ exp(x − max_g)).
    *
    * The group-max side is an aggregate of group-cardinality rows, so it
    * is BROADCAST — the fact scan never shuffles for the join (a shuffle
    * join here funnels every row through |groups| hot reducers). Each
    * exp term is rounded to 12 dp and summed as exact DECIMAL, so the
    * per-group sum is associative — shuffle/partial-agg order cannot
    * move the 6-dp result, and the oracle replays it bit-for-bit.
    */
  def twoPass(df: DataFrame, groupCol: String, x: Column): DataFrame = {
    val t = df.select(col(groupCol), x.as("x"))
    val m = t.groupBy(col(groupCol)).agg(max(col("x")).as("mx"))
    t.join(broadcast(m), groupCol)
      .groupBy(col(groupCol), col("mx"))
      .agg(sum(round(exp(col("x") - col("mx")), 12).cast("decimal(26,12)")).as("s"))
      .select(col(groupCol),
        round(col("mx") + log(col("s").cast("double")), 6).as("lse"))
  }

  /** Single-pass LSE Aggregator: state = (runningMax, Σ exp(x − runningMax)). */
  class LseAgg extends Aggregator[Double, (Double, Double), Double] {
    def zero: (Double, Double) = (Double.NegativeInfinity, 0.0)
    def reduce(b: (Double, Double), x: Double): (Double, Double) =
      if (x <= b._1) (b._1, b._2 + math.exp(x - b._1))
      else (x, b._2 * math.exp(b._1 - x) + 1.0)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      if (a._1 == Double.NegativeInfinity) b
      else if (b._1 == Double.NegativeInfinity) a
      else if (a._1 >= b._1) (a._1, a._2 + b._2 * math.exp(b._1 - a._1))
      else (b._1, b._2 + a._2 * math.exp(a._1 - b._1))
    def finish(r: (Double, Double)): Double =
      if (r._1 == Double.NegativeInfinity) Double.NegativeInfinity
      else r._1 + math.log(r._2)
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** A9 demonstration query: per returnflag, LSE of ln(1 + quantity) —
    * log-domain "mass" accumulation over the fact table.
    */
  def lseByFlag(spark: SparkSession, dir: String): DataFrame =
    twoPass(Tables.lineitem(spark, dir), "l_returnflag", log(col("l_quantity") + 1))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_logsumexp" -> ((s, d) => lseByFlag(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // identical 2-pass shape; 12-dp rounded exp terms summed as DECIMAL
    // mirror the associative Spark aggregation exactly
    "fn_logsumexp" ->
      """WITH t AS (SELECT l_returnflag, ln(l_quantity + 1) AS x FROM lineitem),
            m AS (SELECT l_returnflag, max(x) AS mx FROM t GROUP BY l_returnflag)
         SELECT t.l_returnflag,
           round(mx + ln(CAST(sum(CAST(round(exp(x - mx), 12) AS DECIMAL(26,12)))
                              AS DOUBLE)), 6) AS lse
         FROM t JOIN m USING (l_returnflag)
         GROUP BY t.l_returnflag, mx""",
  )
}
