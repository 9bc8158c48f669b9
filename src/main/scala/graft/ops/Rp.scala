package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — the ZERO-fit companion to
  * [[Pca]]: a seeded pseudo-random matrix maps `dim`-d embeddings to
  * `k`-d with pairwise distances preserved to (1 ± ε) w.h.p. (Achlioptas
  * 2003 shows database-friendly ±1/uniform entries suffice — no
  * Gaussian sampling needed). Where PCA pays one corpus moment pass to
  * fit, RP pays NOTHING: the matrix is a pure function of (seed, dim,
  * k), derived per ROW inside the codegen projection — so the operator
  * is a single row-local scan projection at any corpus size, trivially
  * linear, no shuffle, and the same matrix reproduces on any cluster.
  *
  * Reuses the PCA serving kernel ([[graft.functions.ProjectExpr]], the
  * codegen mat-vec) with a zero mean — one primitive loop inside
  * whole-stage codegen, no UDF.
  */
object Rp {

  /** The deterministic projection matrix: `k` rows of `dim` entries in
    * (-1/√k, 1/√k), each entry a seeded hash of its coordinates (same
    * construction as [[Similarity.hyperplanes]] — any engine replays it
    * from the seed alone). The 1/√k scale makes the projection an
    * approximate isometry (E‖Rx‖² = ‖x‖²·E[u²]·... up to the uniform
    * variance constant — distances are preserved up to one GLOBAL
    * factor, which every distance/cosine consumer cancels). */
  def basis(dim: Int, k: Int, seed: Long = 7L): Array[Array[Double]] = {
    require(k >= 1 && dim >= 1, s"need k, dim >= 1 (got k=$k, dim=$dim)")
    val scale = 1.0 / math.sqrt(k.toDouble)
    Array.tabulate(k) { r =>
      Array.tabulate(dim) { i =>
        val h = graft.functions.Hash64.hashString(s"rp:$seed:$r:$i")
        h.toDouble / Long.MaxValue.toDouble * scale
      }
    }
  }

  /** Adds `outCol` = the k-d projection of `vecCol`. Row-local codegen
    * mat-vec; vectors shorter than `dim` project as if zero-padded
    * (ProjectExpr's ragged defence), longer ones use their first `dim`
    * coordinates. */
  def project(df: DataFrame, vecCol: String, k: Int, dim: Int,
      seed: Long = 7L, outCol: String = "rp"): DataFrame =
    df.withColumn(outCol, graft.functions.ProjectExpr(
      col(vecCol), new Array[Double](dim), basis(dim, k, seed)))
}
