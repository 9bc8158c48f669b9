package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared typing rules for the cosine expressions: each input must be
  * `ARRAY<FLOAT>` or `ARRAY<DOUBLE>` (independently — a float column can
  * be compared against a double literal). The element width is resolved
  * at ANALYSIS time and baked into the generated code; reading a double
  * slot as a float would silently return garbage, so anything else is
  * rejected up front instead of mis-read at runtime. */
private[functions] trait CosineTyping { self: BinaryExpression =>

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires ARRAY<FLOAT> or ARRAY<DOUBLE> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def leftIsDouble: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  protected def rightIsDouble: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType
}

/** Native Catalyst expression for cosine distance over two
  * `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` columns — the codegen'd replacement
  * for the Scala UDF (SURVEY §2.12: "promote to codegen expression if
  * bench demands").
  *
  * The generated code calls [[CosineDistance.compute]] directly on the
  * unsafe `ArrayData`, so the hot loop reads primitive elements with no
  * boxing, no `Seq[Float]` conversion, and no UDF dispatch — it stays
  * inside the surrounding whole-stage-codegen pipeline.
  *
  * Semantics match the reference's `array_cosine_distance`
  * (query.py:169): `1 - dot/(|a||b|)`; null for null/mismatched/zero
  * vectors (which drops them from threshold filters).
  */
case class CosineDistance(left: Expression, right: Expression)
    extends BinaryExpression with CosineTyping {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineDistance.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsDouble, rightIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double result = graft.functions.CosineDistance.compute(
         |  $a, $b, $leftIsDouble, $rightIsDouble);
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

/** Codegen'd cosine SIMILARITY over two `ARRAY<FLOAT>` / `ARRAY<DOUBLE>`
  * columns, bit-identical to the declarative form
  * `aggregate(zip_with(a,b,*), 0.0, +) / sqrt(dot(a,a)) / sqrt(dot(b,b))`
  * it replaces: one left-to-right accumulation pass and the same
  * two-step division order, so 4-dp-rounded oracle comparisons are
  * unaffected while the per-pair cost drops from three interpreted
  * higher-order folds (plus per-pair norm recomputation) to one
  * primitive loop that stays inside whole-stage codegen.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CosineTyping {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsDouble, rightIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // primitive-returning codegen — no per-row Double box (null only
    // means length mismatch; zero-norm inputs surface as NaN, matching
    // the fused dot/sqrt/sqrt arithmetic)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CosineSimilarity.computePrim(
         |    $a, $b, $leftIsDouble, $rightIsDouble);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Hot loop shared by interpreted eval and generated code. Accumulation
    * and division order MUST stay `dot / sqrt(na) / sqrt(nb)` with
    * left-to-right sums — the DuckDB oracle computes exactly this. The
    * element-width flags are analysis-time constants, so the JIT hoists
    * the branches out of the loop. */
  def compute(a: ArrayData, b: ArrayData,
      aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    if (a == null || b == null) return null
    if (a.numElements() != b.numElements()) return null
    java.lang.Double.valueOf(computePrim(a, b, aDouble, bDouble))
  }

  /** Hot loop; callers have checked nulls and length equality. */
  def computePrim(a: ArrayData, b: ArrayData,
      aDouble: Boolean, bDouble: Boolean): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  def apply(a: Column, b: Column): Column =
    GraftShims.column(CosineSimilarity(GraftShims.expression(a), GraftShims.expression(b)))
}

object CosineDistance {

  /** Hot loop shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData,
      aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(1.0 - dot / math.sqrt(na * nb))
  }

  def apply(a: Column, b: Column): Column =
    GraftShims.column(CosineDistance(GraftShims.expression(a), GraftShims.expression(b)))
}

/** Codegen'd dot product over two `ARRAY<FLOAT>` / `ARRAY<DOUBLE>`
  * columns. Exists so the all-pairs similarity paths can precompute each
  * side's squared norm ONCE per row instead of re-accumulating both
  * norms inside every pair's [[CosineSimilarity]] (3× the flops at
  * n² pairs). Bit-exactness contract, pinned in OpsSpec:
  * `DotProduct(a,b) / sqrt(DotProduct(a,a)) / sqrt(DotProduct(b,b))`
  * equals `CosineSimilarity(a,b)` EXACTLY — the accumulation here is
  * the same left-to-right `+=` loop (`x*x` for a self-dot matches the
  * fused loop's norm term), and the division order is the caller's to
  * preserve. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CosineTyping {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsDouble, rightIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // primitive-returning codegen: the boxed-wrapper form allocates one
    // java.lang.Double PER PAIR, which at n² pair evaluations turns the
    // loop into an allocation benchmark (null here only means length
    // mismatch, checked inline)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DotProduct.computePrim(
         |    $a, $b, $leftIsDouble, $rightIsDouble);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Boxed wrapper for interpreted eval (nulls for null/mismatched
    * inputs). */
  def compute(a: ArrayData, b: ArrayData,
      aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    if (a == null || b == null) return null
    if (a.numElements() != b.numElements()) return null
    java.lang.Double.valueOf(computePrim(a, b, aDouble, bDouble))
  }

  /** Hot loop shared by interpreted eval and generated code — the same
    * left-to-right accumulation as [[CosineSimilarity.compute]].
    * Callers have already checked nulls and length equality. */
  def computePrim(a: ArrayData, b: ArrayData,
      aDouble: Boolean, bDouble: Boolean): Double = {
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y
      i += 1
    }
    dot
  }

  def apply(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))
}
