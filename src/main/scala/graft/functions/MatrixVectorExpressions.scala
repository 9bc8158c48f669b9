package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

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

/** Nearest-cell assignment PLUS the member's angle to that centroid —
  * `struct(cell INT, angle DOUBLE)` in one pass over the centroids.
  * Codegen replacement for `SemanticAnn.assignUdf`, the last corpus-pass
  * UDF in the RDF-side ANN build: the cell is the same euclidean argmin
  * as [[NearestCellExpr]] (strict `<` ties to the lowest index, distances
  * clamped to the shorter dim), the angle is the angular radius
  * contribution the radius aggregation maxes over. Zero-norm vectors
  * assign to cell -1 with angle 0 (cell -1 is never probed — a zero
  * vector can never pass a cosine threshold); degenerate (zero-norm
  * centroid) angles collapse to 0, same as the UDF's NaN guard. */
case class CellAngleExpr(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with MatrixVectorTyping {

  override def dataType: DataType = CellAngleExpr.schema
  override def prettyName: String = "cell_angle"

  override def nullSafeEval(v: Any): Any =
    CellAngleExpr.compute(v.asInstanceOf[ArrayData], centroids, childIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.CellAngleExpr.compute($v, $ref, $childIsDouble);"
    })
  }

  override def toString: String =
    s"cell_angle($child, cells=${centroids.length})"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CellAngleExpr {

  val schema: StructType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("angle", DoubleType, nullable = false)))

  /** Hot loop shared by interpreted eval and generated code. */
  def compute(vec: ArrayData, centroids: Array[Array[Float]],
      vDouble: Boolean): InternalRow = {
    val len = vec.numElements()
    var norm = 0.0
    var i = 0
    while (i < len) {
      val x = if (vDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      norm += x * x
      i += 1
    }
    if (norm == 0.0) return new GenericInternalRow(Array[Any](-1, 0.0))
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = if (len < cent.length) len else cent.length
      var d = 0.0
      var j = 0
      while (j < n) {
        val x = if (vDouble) vec.getDouble(j) else vec.getFloat(j).toDouble
        val diff = x - cent(j)
        d += diff * diff
        j += 1
      }
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    val cent = centroids(best)
    val n = if (len < cent.length) len else cent.length
    var dot = 0.0
    var nv = 0.0
    var nc = 0.0
    var k = 0
    while (k < n) {
      val x = if (vDouble) vec.getDouble(k) else vec.getFloat(k).toDouble
      val y = cent(k).toDouble
      dot += x * y; nv += x * x; nc += y * y
      k += 1
    }
    val angle =
      if (nv == 0.0 || nc == 0.0) 0.0
      else math.acos(math.max(-1.0, math.min(1.0, dot / math.sqrt(nv * nc))))
    new GenericInternalRow(Array[Any](best, angle))
  }

  def apply(vec: Column, centroids: Array[Array[Float]]): Column =
    GraftShims.column(CellAngleExpr(GraftShims.expression(vec), centroids))
}

/** PCA projection — the k coordinates of the mean-centered vector
  * against a fixed (possibly whitening-scaled) principal-axis matrix,
  * as one codegen mat-vec with the model shipped as plan constants
  * (same no-UDF, no-broadcast pattern as the ANN cell assignment).
  * Each coordinate sums `(x_i - mean_i) * axis_i` in ascending index
  * order over `min(|vec|, |mean|, |axis|)` elements (the repo-wide
  * ragged clamp), matching DuckDB's `list_dot_product` evaluation so
  * the exported-basis oracle replays bit-for-bit. Null vector → null. */
case class ProjectExpr(child: Expression, mean: Array[Double],
    basis: Array[Array[Double]])
    extends UnaryExpression with MatrixVectorTyping {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pca_project"

  override def nullSafeEval(v: Any): Any =
    ProjectExpr.compute(v.asInstanceOf[ArrayData], mean, basis, childIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("mean", mean, "double[]")
    val bRef = ctx.addReferenceObj("basis", basis, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.ProjectExpr.compute($v, $mRef, $bRef, $childIsDouble);"
    })
  }

  override def toString: String =
    s"pca_project($child, k=${basis.length}, dim=${mean.length})"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ProjectExpr {

  /** Hot loop shared by interpreted eval and generated code. */
  def compute(vec: ArrayData, mean: Array[Double],
      basis: Array[Array[Double]], vDouble: Boolean): ArrayData = {
    val len = vec.numElements()
    val out = new Array[Any](basis.length)
    var c = 0
    while (c < basis.length) {
      val ax = basis(c)
      var n = if (len < mean.length) len else mean.length
      if (ax.length < n) n = ax.length
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (vDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
        dot += (x - mean(i)) * ax(i)
        i += 1
      }
      out(c) = dot
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(vec: Column, mean: Array[Double], basis: Array[Array[Double]]): Column =
    GraftShims.column(ProjectExpr(GraftShims.expression(vec), mean, basis))
}
