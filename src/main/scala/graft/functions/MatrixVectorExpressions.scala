package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Shared typing for the vector-against-fixed-matrix expressions: the
  * child must be `ARRAY<FLOAT>` or `ARRAY<DOUBLE>`; the matrix (LSH
  * hyperplanes / k-means centroids) is an analysis-time constant carried
  * on the expression and shipped to executors inside the serialized
  * plan — the rows it scores against never shuffle. */
private[functions] trait MatrixVectorTyping { self: UnaryExpression =>

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires an ARRAY<FLOAT> or ARRAY<DOUBLE> input, " +
        s"got ${other.simpleString}")
  }

  protected def childIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
}

/** Sign-random-projection LSH bucket id — the codegen'd replacement for
  * `Similarity.bucketUdf` (SURVEY §2.12's "promote to codegen expression
  * if bench demands"; the UDF paid a `Seq[Float]` wrapper allocation +
  * dispatch per corpus row on every `buildLsh` pass). Bit `p` of the
  * result is set iff `dot(vec, planes(p)) >= 0`, with each plane dot
  * running over `min(|plane|, |vec|)` elements — identical arithmetic,
  * identical truncation rule, so bucket ids are unchanged (pinned in
  * OpsSpec against the UDF's values). Null vector → null bucket. */
case class SignBucketExpr(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression with MatrixVectorTyping {

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bucket"

  override def nullSafeEval(v: Any): Any =
    SignBucketExpr.compute(v.asInstanceOf[ArrayData], planes, childIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.SignBucketExpr.compute($v, $ref, $childIsDouble);"
    })
  }

  // the matrix is a constant, not a tree position — keep explain output
  // readable instead of printing planes*dim floats
  override def toString: String =
    s"sign_bucket($child, planes=${planes.length})"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBucketExpr {

  /** Hot loop shared by interpreted eval and generated code. */
  def compute(vec: ArrayData, planes: Array[Array[Float]], vDouble: Boolean): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(plane.length, vec.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (vDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
        dot += plane(i) * x
        i += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def apply(vec: Column, planes: Array[Array[Float]]): Column =
    GraftShims.column(SignBucketExpr(GraftShims.expression(vec), planes))
}

/** Nearest-centroid cell index (squared-euclidean argmin, matching the
  * k-means trainer) — the codegen'd replacement for `Ivf.assignUdf`.
  * Ties break to the LOWEST cell index (strict `<`), and the distance
  * loop runs over the VECTOR's length like the trainer's `dist2` — the
  * cell table must agree with training or probes read the wrong files.
  * Null vector → null cell. */
case class NearestCellExpr(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with MatrixVectorTyping {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(v: Any): Any =
    NearestCellExpr.compute(v.asInstanceOf[ArrayData], centroids, childIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.NearestCellExpr.compute($v, $ref, $childIsDouble);"
    })
  }

  override def toString: String =
    s"nearest_cell($child, cells=${centroids.length})"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCellExpr {

  /** Hot loop shared by interpreted eval and generated code. */
  def compute(vec: ArrayData, centroids: Array[Array[Float]], vDouble: Boolean): Int = {
    val n0 = vec.numElements()
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      // ragged-dim defence: a corpus vector longer than the trained
      // centroid dim would index past cent — clamp like SignBucketExpr
      val n = if (n0 < cent.length) n0 else cent.length
      var d = 0.0
      var i = 0
      while (i < n) {
        val x = if (vDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
        val diff = x - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  def apply(vec: Column, centroids: Array[Array[Float]]): Column =
    GraftShims.column(NearestCellExpr(GraftShims.expression(vec), centroids))
}
