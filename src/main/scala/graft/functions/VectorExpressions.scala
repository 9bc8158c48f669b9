package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine distance over two
  * `ARRAY<FLOAT>` columns — the codegen'd replacement for the Scala UDF
  * (SURVEY §2.12: "promote to codegen expression if bench demands").
  *
  * The generated code calls [[CosineDistance.compute]] directly on the
  * unsafe `ArrayData`, so the hot loop reads primitive floats with no
  * boxing, no `Seq[Float]` conversion, and no UDF dispatch — it stays
  * inside the surrounding whole-stage-codegen pipeline.
  *
  * Semantics match the reference's `array_cosine_distance`
  * (query.py:169): `1 - dot/(|a||b|)`; null for null/mismatched/zero
  * vectors (which drops them from threshold filters).
  */
case class CosineDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineDistance.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double result = graft.functions.CosineDistance.compute($a, $b);
         |if (result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = result.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineDistance {

  /** Hot loop shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(1.0 - dot / math.sqrt(na * nb))
  }

  def apply(a: Column, b: Column): Column =
    GraftShims.column(CosineDistance(GraftShims.expression(a), GraftShims.expression(b)))
}
