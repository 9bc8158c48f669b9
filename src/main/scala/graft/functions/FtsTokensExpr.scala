package graft.functions

import graft.fts.FtsSettings
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Index-side FTS analysis as a whole-stage-codegen expression — the
  * replacement for the Scala UDF the postings build used to apply over
  * the entire literals corpus, the single biggest one-time text pass at
  * 100 TB (reference analog: `create_fts_index`, main.py:218-220, where
  * DuckDB's FTS extension runs the same analysis natively).
  *
  * Token-for-token identical to [[FtsSettings.indexTokens]] — it IS that
  * function (strip accents → lower → split on the ignore regex →
  * stopword drop on the unstemmed token → Porter stem), called from
  * generated code with the settings shipped as a plan constant; parity
  * against the UDF is pinned in FtsSpec. A NULL document analyzes to the
  * EMPTY token array, not NULL — the corpus stats (`numDocs`, `avgdl`)
  * count every row like DuckDB indexes every row of the literals table,
  * so a null literal must surface as a zero-length doc, exactly what the
  * nullable UDF returned for it. */
case class FtsTokensExpr(child: Expression, settings: FtsSettings)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "fts_tokens"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    FtsTokensExpr.compute(
      if (v == null) null else v.asInstanceOf[UTF8String], settings)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ftsSettings", settings,
      classOf[FtsSettings].getName)
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${childGen.code}
        $javaType ${ev.value} = graft.functions.FtsTokensExpr.compute(
          ${childGen.isNull} ? null : ${childGen.value}, $ref);
      """,
      isNull = FalseLiteral)
  }

  // the settings are a constant, not a tree position — keep explain tidy
  override def toString: String = s"fts_tokens($child)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FtsTokensExpr {

  /** Hot loop shared by interpreted eval and generated code; null-safe
    * (null text → empty array, see class doc). */
  def compute(text: UTF8String, settings: FtsSettings): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val toks = settings.indexTokens(text.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column, settings: FtsSettings): Column =
    GraftShims.column(FtsTokensExpr(GraftShims.expression(text), settings))
}
