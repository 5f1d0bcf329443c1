package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression converters —
  * the supported way to expose custom Catalyst expressions as Columns
  * from library code (same mechanism `functions._` uses internally).
  */
object GraftExpr {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Replace `df`'s logical plan with a LogicalRDD leaf over its
    * INTERNAL-row RDD — the plan cut `Dataset.localCheckpoint` performs,
    * without the checkpoint's block storage (the caller persists the
    * result instead). Unlike `createDataFrame(df.rdd, schema)` this
    * skips the external-Row encode/decode round-trip, which measured
    * ~2× on array-heavy frames. The per-row `copy()` matches Spark's own
    * checkpoint implementation: `toRdd` may yield a reused mutable row.
    */
  def truncated(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd.map(_.copy()), ds.schema)
  }
}
