package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fitted PCA model: `mean` centers, `basis` holds the top-k principal
  * axes as ROWS (unit-norm, eigenvalue-descending), `eigenvalues` the
  * matching sample-covariance variances. With `whiten`, projection
  * coordinates are scaled by 1/sqrt(eigenvalue) so the projected cloud
  * has identity covariance — the standard preconditioner before
  * cosine/euclidean ANN when the raw dimensions are correlated.
  * [[effectiveBasis]] folds that scale into the axes, so serving is
  * always ONE mat-vec regardless of the flag. */
final case class PcaModel(
    mean: Array[Double],
    basis: Array[Array[Double]],
    eigenvalues: Array[Double],
    whiten: Boolean) {
  def k: Int = basis.length
  def dim: Int = mean.length

  /** Axes with the whitening scale folded in (identity scale when
    * `whiten` is off) — exactly the matrix the projection expression
    * and the exported oracle policy use. */
  def effectiveBasis: Array[Array[Double]] =
    if (!whiten) basis
    else basis.zip(eigenvalues).map { case (ax, ev) =>
      // a zero-variance axis stays zero instead of dividing by ~0: the
      // coordinate is identically 0 for every centered vector anyway
      val s = if (ev > 1e-12) 1.0 / math.sqrt(ev) else 0.0
      ax.map(_ * s)
    }
}

/** Distributed PCA / whitening over an embedding column.
  *
  * Fit is ONE pass with map-side combining and a shuffle bounded by
  * the PARTITION count, never the row count: `mapPartitions` folds each
  * partition into a single (n, Σx, upper-tri ΣxxᵀT) moment row (the
  * buffer is d(d+3)/2 doubles — ~33 KB at d=64), the moment rows merge
  * element-wise via one posexplode + groupBy(pos) aggregate (≤
  * partitions × d(d+3)/2 tiny rows), and the driver eigendecomposes
  * the resulting d×d covariance with a cyclic Jacobi sweep — d is the
  * embedding dimension, microscopic next to the corpus, which is the
  * same final-step shape `spark.ml`'s RowMatrix uses. Projection is a
  * codegen mat-vec ([[graft.functions.ProjectExpr]]) with the model
  * shipped as a plan constant — no UDF, no broadcast round-trip, same
  * pattern as the ANN cell assignment.
  *
  * Determinism: the Jacobi sweep order is fixed and eigenvector signs
  * are canonicalized (largest-|component| positive), so a fitted model
  * is a pure function of the accumulated moments. Null vectors are
  * skipped in fit and project to null. Ragged dims: fit REFUSES a
  * mixed-dimension corpus (a clamped covariance is corpus-wide silent
  * corruption), while projection clamps per row like the other
  * mat-vec expressions — the asymmetry is deliberate. */
object Pca {

  /** Fit the top-k principal axes of `vecCol`. */
  def fit(df: DataFrame, vecCol: String, k: Int,
      whiten: Boolean = false): PcaModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol).cast("array<double>")).as[Array[Double]]
    // one moment row per partition: (n, sum ++ packed-upper-tri gram)
    val moments = vecs.mapPartitions { it =>
      var n = 0L
      var d = -1
      var ragged = 0L
      var sum: Array[Double] = null
      var gram: Array[Double] = null // packed upper triangle, row-major
      it.foreach { v =>
        if (v != null) {
          if (d < 0) { d = v.length; sum = new Array(d); gram = new Array(d * (d + 1) / 2) }
          if (v.length != d) ragged += 1
          val m = math.min(v.length, d)
          var i = 0
          var g = 0
          while (i < m) {
            sum(i) += v(i)
            var j = i
            // advance g to row i's diagonal offset once per row
            while (j < m) { gram(g + (j - i)) = gram(g + (j - i)) + v(i) * v(j); j += 1 }
            g += d - i
            i += 1
          }
          n += 1
        }
      }
      if (n == 0) Iterator.empty
      // n, n·d and the ragged count ride slots 0-2 of the one moment
      // array, so the whole merge + fetch is a single Spark action AND
      // a mis-dimensioned corpus is detectable below, whether the
      // mismatch falls inside one partition (ragged count) or across
      // partitions (weighted-dim check) — the element-wise merge would
      // silently corrupt the covariance otherwise, so fit REFUSES
      // ragged input (projection clamps, per the repo convention; the
      // asymmetry is deliberate: a clamped projection is a per-row
      // truncation, a clamped covariance is corpus-wide corruption)
      else Iterator.single(Array(n.toDouble, n.toDouble * d, ragged.toDouble) ++ sum ++ gram)
    }
    // element-wise merge across partitions: rows are bounded by the
    // PARTITION count × buffer size, so this explode is tiny at any
    // corpus size
    val mergedRows = moments.toDF("m")
      .select(posexplode(col("m")))
      .groupBy("pos").agg(sum(col("col")).as("s"))
      .collect()
    require(mergedRows.nonEmpty, "PCA fit over an empty (or all-null) vector column")
    val flat = new Array[Double](mergedRows.length)
    mergedRows.foreach(r => flat(r.getInt(0)) = r.getDouble(1))
    val nTotal = flat(0)
    // flat = [n, n·d, ragged] ++ sum(d) ++ gram(d(d+1)/2): solve d
    val dim = ((math.sqrt(8.0 * (flat.length - 3) + 9.0) - 3.0) / 2.0).round.toInt
    require(dim * (dim + 3) / 2 == flat.length - 3,
      s"inconsistent moment length ${flat.length}")
    require(flat(2) == 0.0 && flat(1) == nTotal * dim,
      s"mixed vector dimensions (within-partition ragged rows: ${flat(2).toLong}, " +
        s"weighted dim ${flat(1) / nTotal} vs $dim) - PCA fit needs a uniform " +
        "embedding dim; a clamped covariance would be silently corrupt")
    val mean = new Array[Double](dim)
    var i = 0
    while (i < dim) { mean(i) = flat(3 + i) / nTotal; i += 1 }
    // covariance = gram/n - mean meanT (sample scaling by n keeps the
    // whitened-covariance law exact for the spec's finite samples)
    val cov = Array.ofDim[Double](dim, dim)
    var g = 3 + dim // gram starts after [n, n·d, ragged] ++ sum
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = flat(g) / nTotal - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        g += 1; j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val kk = math.min(k, dim)
    PcaModel(mean, evecs.take(kk), evals.take(kk), whiten)
  }

  /** Append the k projection coordinates of `vecCol` as `outCol`
    * (ARRAY<DOUBLE>) — one codegen mat-vec over the centered vector
    * with the (whitening-folded) basis as a plan constant. */
  def transform(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "proj"): DataFrame =
    df.withColumn(outCol,
      graft.functions.ProjectExpr(col(vecCol), model.mean, model.effectiveBasis))

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: fixed
    * (p,q) sweep order, converged when the off-diagonal Frobenius norm
    * drops below eps — deterministic for a given input. Returns
    * (eigenvalues, eigenvectors as rows), eigenvalue-DESCENDING, each
    * vector sign-canonicalized so its largest-|component| is positive
    * (Jacobi's sign is otherwise arbitrary, and the exported oracle
    * policy must be reproducible). Driver-side: d = embedding dim. */
  private[ops] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 64, eps: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    while (off > eps && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > eps / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val tt = if (theta == 0.0) 1.0 else t
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    // sort descending by eigenvalue (stable on ties: lower original
    // index first), canonicalize signs
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val vec = Array.tabulate(d)(r => v(r)(i))
      var bi = 0
      var bm = 0.0
      var r = 0
      while (r < d) { val m = math.abs(vec(r)); if (m > bm) { bm = m; bi = r }; r += 1 }
      if (vec(bi) < 0) vec.map(x => -x) else vec
    }.toArray
    (evals, evecs)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += 2.0 * a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
