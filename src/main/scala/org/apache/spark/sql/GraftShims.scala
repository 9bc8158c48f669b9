package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between raw Catalyst [[Expression]]s and the public [[Column]]
  * API. Spark 4 made `new Column(expr)` private (Column now wraps a
  * ColumnNode); `classic.ExpressionUtils` is `private[sql]`, so this
  * one-file shim lives in the `org.apache.spark.sql` package to re-export
  * the two conversions the graft engine needs.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-wrap a DataFrame around its OPTIMIZED logical plan: later
    * actions on the result re-run analysis/optimization over the
    * already-collapsed tree (a fraction of the original node count)
    * instead of the raw Dataset-op chain. `Dataset.ofRows` is
    * `private[sql]`, hence the shim. */
  def ofOptimized(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    org.apache.spark.sql.classic.Dataset.ofRows(
      cdf.sparkSession, cdf.queryExecution.optimizedPlan)
  }

  /** Register a temp function on a LIVE session (the public
    * `SparkSessionExtensions` route only applies at session build time;
    * `sessionState` is `private[sql]`, hence this shim). */
  def registerTempFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      // "scala_udf" is the closest entry in ExpressionInfo's closed
      // source vocabulary (built-in/hive/*_udf) for an engine-provided
      // function; the builders are codegen'd Catalyst expressions
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
