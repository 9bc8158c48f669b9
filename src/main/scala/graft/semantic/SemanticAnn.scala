package graft.semantic

import graft.ops.Ivf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lossless IVF acceleration for the `semantic` distance-threshold filter
  * (reference query.py:166-170: `cosine distance < 0.5`, score = 1/d).
  *
  * The subject-embedding table is Voronoi-partitioned into `nLists` cells
  * (seeded k-means, [[Ivf.trainCentroids]]); each cell records the max
  * ANGULAR radius of its members around the centroid. A threshold query
  * probes only cells whose spherical cap can intersect the query cap —
  * by the triangle inequality on the unit sphere,
  * `angle(q,v) >= angle(q,c) - radius(c)` for every member v of cell c,
  * so a cell with `angle(q,c) - radius(c) >= acos(1-maxDist)` cannot
  * contain a match. Survivors are rescored EXACTLY with the codegen'd
  * cosine expression: results are identical to the brute scan, the
  * pruning is purely a scan reduction.
  *
  * Scale: the cells parquet is written `partitionBy("cell")`, so a probe
  * reads only intersecting cells' files (the classic IVF contract); the
  * centroid/radius metadata is O(nLists · dim) on the driver.
  */
final case class SemanticAnn(
    cells: DataFrame, // (hash, vec, cell)
    centroids: Array[Array[Float]],
    radii: Array[Double],
    /** Max `literals_semantic_delta` seq folded into `cells` — the
      * consistency witness against the composed embedding frame
      * ([[SemanticMaintenance.composeWithGen]]); 0 = pristine build. */
    semGen: Long = 0L,
    /** When an O(delta) [[SemanticAnn.patch]] has appended rows, `cells`
      * may hold superseded (old-vec) and removed rows; the authoritative
      * composed frame re-joins candidates by hash so scoring always sees
      * the CURRENT vector and dropped subjects vanish. None = pristine
      * cells (exactly one live row per hash) — skip the join. */
    authoritative: Option[DataFrame] = None) {

  /** Candidate rows (hash, vec) for a `distance < maxDist` query —
    * a strict superset of the matches. */
  def candidates(q: Array[Float], maxDist: Double): DataFrame = {
    val probe = probeCells(q, maxDist)
    val raw =
      if (probe.isEmpty) cells.select("hash", "vec").filter(lit(false))
      else cells.filter(col("cell").isin(probe: _*)).select("hash", "vec")
    authoritative match {
      case Some(sem) =>
        raw.select("hash").distinct()
          .join(sem.select("hash", "vec"), Seq("hash"))
      case None => raw
    }
  }

  /** Cells whose cap can intersect the query cap. Zero-norm queries match
    * nothing (cosine to them is undefined ⇒ null ⇒ dropped by the
    * threshold, same as the brute path). */
  def probeCells(q: Array[Float], maxDist: Double): Seq[Int] = {
    val qn = math.sqrt(q.foldLeft(0.0)((a, x) => a + x.toDouble * x))
    if (qn == 0.0) return Nil
    val capAngle = math.acos(math.max(-1.0, math.min(1.0, 1.0 - maxDist)))
    centroids.indices.filter { c =>
      val cvec = centroids(c)
      val cn = math.sqrt(cvec.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      if (cn == 0.0) true // degenerate centroid: always probe
      else {
        var dot = 0.0
        var i = 0
        while (i < q.length && i < cvec.length) { dot += q(i).toDouble * cvec(i); i += 1 }
        val angle = math.acos(math.max(-1.0, math.min(1.0, dot / (qn * cn))))
        // 1e-9 slack absorbs float rounding in the radius computation
        angle - radii(c) < capAngle + 1e-9
      }
    }
  }
}

object SemanticAnn {

  /** (hash, vec, cell, angle) via the codegen'd
    * [[graft.functions.CellAngleExpr]] — the assignment pass over the
    * full embedding table stays inside whole-stage codegen (no UDF
    * boundary, no broadcast round-trip: the centroid matrix ships as a
    * plan constant, O(nLists · dim)). Zero vectors assign to cell -1. */
  private def assigned(sem: DataFrame, centroids: Array[Array[Float]]): DataFrame =
    sem.select(col("hash"), col("vec"),
        graft.functions.CellAngleExpr(col("vec"), centroids).as("ca"))
      .select(col("hash"), col("vec"),
        col("ca.cell").as("cell"), col("ca.angle").as("angle"))

  /** Build over a (hash, vec) table. Zero vectors go to cell -1, which is
    * never probed (they can never pass a cosine threshold). */
  def build(sem: DataFrame, nLists: Int = 16): SemanticAnn = {
    val centroids = Ivf.trainCentroids(sem, "vec", nLists)
    val assignedDf = assigned(sem, centroids).persist()
    val radii = new Array[Double](centroids.length)
    assignedDf.filter(col("cell") >= 0).groupBy("cell").agg(max("angle").as("r"))
      .collect().foreach(r => radii(r.getInt(0)) = r.getDouble(1))
    SemanticAnn(assignedDf.drop("angle"), centroids, radii)
  }

  /** O(delta) update for a persisted ANN whose `semGen` lags the composed
    * embedding frame: assign the new/updated vectors to the EXISTING
    * centroids, widen the touched cells' radii (monotone — removals
    * leave a radius conservatively wide, which only costs pruning), and
    * append the rows to the cells store. The meta (with the new gen) is
    * written LAST: a crash between the cells append and the meta write
    * leaves the old gen on disk, so the next load re-patches the same
    * delta — duplicate cell rows are harmless because a patched ANN
    * always serves through the authoritative re-join.
    *
    * Losslessness: every current subject keeps ≥1 cells row holding its
    * current vector inside its (possibly widened) cell radius, so the
    * cap-intersection prune still upper-bounds the match set; superseded
    * and removed rows add candidates that the re-join resolves or drops.
    */
  def patch(spark: SparkSession, dir: String, ann: SemanticAnn,
      delta: DataFrame, newGen: Long): SemanticAnn = {
    val adds = delta.filter(col("vec").isNotNull)
    val assignedDf = assigned(adds, ann.centroids).persist()
    try {
      val widened = ann.radii.clone()
      assignedDf.filter(col("cell") >= 0).groupBy("cell").agg(max("angle").as("r"))
        .collect().foreach { r =>
          val c = r.getInt(0)
          widened(c) = math.max(widened(c), r.getDouble(1))
        }
      assignedDf.drop("angle")
        .write.mode("append").partitionBy("cell").parquet(s"$dir/cells")
      writeMeta(spark, dir, ann.centroids, widened, newGen)
      SemanticAnn(spark.read.parquet(s"$dir/cells"), ann.centroids, widened,
        semGen = newGen)
    } finally { assignedDf.unpersist(); () }
  }

  /** Persist cells partitioned by cell id + centroid/radius metadata. */
  def write(ann: SemanticAnn, dir: String): Unit = {
    ann.cells.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    writeMeta(ann.cells.sparkSession, dir, ann.centroids, ann.radii, ann.semGen)
  }

  private def writeMeta(spark: SparkSession, dir: String,
      centroids: Array[Array[Float]], radii: Array[Double], semGen: Long): Unit = {
    import spark.implicits._
    centroids.indices
      .map(c => (c, centroids(c).toSeq, radii(c), semGen))
      .toDF("cell", "centroid", "radius", "semGen")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: SparkSession, dir: String): Option[SemanticAnn] = {
    if (!graft.store.StoreIO.exists(spark, s"$dir/cells")) None
    else try {
      val meta = spark.read.parquet(s"$dir/meta").orderBy("cell").collect()
      val centroids = meta.map(_.getSeq[Float](1).toArray)
      val radii = meta.map(_.getDouble(2))
      // pre-semGen metas (older stores) load as pristine gen 0
      val gen =
        if (meta.nonEmpty && meta(0).schema.fieldNames.contains("semGen"))
          meta(0).getLong(meta(0).fieldIndex("semGen"))
        else 0L
      Some(SemanticAnn(spark.read.parquet(s"$dir/cells"), centroids, radii,
        semGen = gen))
    } catch { case _: Exception => None }
  }
}
