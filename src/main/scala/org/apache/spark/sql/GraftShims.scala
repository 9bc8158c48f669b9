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
