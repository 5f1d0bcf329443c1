package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Closed-form ordinary least squares (y = a + b·x) as a pure aggregate —
  * the regression-by-sufficient-statistics primitive (no reference
  * counterpart; its only models are iterative). One scan computes the
  * five sufficient sums (n, Σx, Σy, Σxy, Σx²; plus Σy² for R²) as EXACT
  * DECIMALs — the whole model is a single mergeable aggregate row, the
  * textbook 100-TB regression: map-side partials, one final combine, no
  * iteration, no driver data. The slope/intercept/R² formulas then run
  * in one fixed double expression order over bit-identical inputs.
  */
object Ols {

  /** Fit extendedprice ~ quantity over the (pushed-down) shipdate range. */
  def fit(spark: SparkSession, dir: String, dt: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(Tables.dateMatches(col("l_shipdate"), dt))
      .select(col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_extendedprice").cast("decimal(12,2)").as("y"))
    li.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,4)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,4)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,4)")).as("syy"))
      .select(col("n"),
        expr("""round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)""").as("slope"),
        expr("""round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)""").as("intercept"),
        expr("""round(pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)""").as("r2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_ols" -> ((s, d) => fit(s, d, "1996")),
  )

  val oracles: Map[String, String] = Map(
    "ml_ols" ->
      """WITH s AS (
           SELECT count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x * y AS DECIMAL(38,4))) AS sxy,
             sum(CAST(x * x AS DECIMAL(38,4))) AS sxx,
             sum(CAST(y * y AS DECIMAL(38,4))) AS syy
           FROM (SELECT CAST(l_quantity AS DECIMAL(12,2)) AS x,
                        CAST(l_extendedprice AS DECIMAL(12,2)) AS y
                 FROM lineitem
                 WHERE strftime(l_shipdate, '%Y-%m-%d') LIKE '1996%'))
         SELECT n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                 - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS intercept,
           round(pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
         FROM s""",
  )
}
