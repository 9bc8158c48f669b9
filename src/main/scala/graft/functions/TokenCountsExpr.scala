package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term frequencies of a token array:
  * `ARRAY<STRUCT<term STRING, tf BIGINT>>`, one entry per distinct
  * non-empty token, first-occurrence order. Null/empty tokens are
  * dropped (the `=!= ""` filter of the exploded plan this replaces).
  *
  * The shuffle eliminator for per-document term statistics (same design
  * as the FTS build's [[FtsTokenCountsExpr]], but over an ALREADY
  * TOKENIZED array so callers keep their exact Spark-native tokenization
  * — `split(lower(trim(text)), ...)` stays in the plan and stays
  * oracle-comparable): `explode(token_counts(tokens))` yields the same
  * (term, tf) rows as `explode(tokens).groupBy(id, term).count()`
  * without shuffling every token occurrence of the corpus. */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.simpleString}")
  }

  override def dataType: DataType = TokenCounts.schema
  override def prettyName: String = "token_counts"

  override def nullSafeEval(tokens: Any): Any =
    TokenCounts.compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.TokenCounts.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCounts {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  /** Hot loop shared by interpreted eval and generated code. Keys are
    * CLONED out of the (possibly buffer-reusing) unsafe input before
    * they outlive the row. */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (t.numBytes() > 0) counts.merge(t.clone(), 1L, (a, b) => a + b)
      }
      i += 1
    }
    val entries = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      entries(o) = new GenericInternalRow(Array[Any](e.getKey, e.getValue))
      o += 1
    }
    new GenericArrayData(entries)
  }

  def apply(tokens: Column): Column =
    GraftShims.column(TokenCounts(GraftShims.expression(tokens)))
}
