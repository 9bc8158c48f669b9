package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor index: partition the
  * corpus into `nLists` Voronoi cells around k-means centroids; a query
  * scans only the `nProbe` closest cells.
  *
  * The coarse quantizer is a small fixed-iteration k-means run on a
  * driver-collected sample (deterministic: seeded sample, centroids
  * initialized from evenly-spaced sample points). Cell assignment and
  * probing reuse the codegen'd cosine machinery. The cell table is the
  * scale artifact: at 100 TB it is written partitioned BY cell, so a
  * probe reads `nProbe/nLists` of the data — the classic IVF contract.
  */
object Ivf {

  final case class IvfIndex(cells: DataFrame, centroids: Array[Array[Float]])

  private def dist2(a: Array[Float], b: Array[Float]): Double = {
    // clamp to the shorter dim (matches NearestCellExpr's ragged defence)
    val n = if (a.length < b.length) a.length else b.length
    var d = 0.0; var i = 0
    while (i < n) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  /** Fixed-iteration k-means on a sample (driver-side; the sample is
    * small and the centroid count smaller). The sample is ordered by a
    * seeded hash OF THE VECTOR (Spark's codegen'd murmur3 over the
    * array — no per-row string mangling), not `rand(seed)`: rand's
    * per-task seeds move with the partition layout, so the "seeded"
    * sample (and with it every centroid and cell assignment) would
    * change whenever the same corpus was read with a different split;
    * the hash ordering is a pure function of the data. */
  def trainCentroids(emb: DataFrame, vecCol: String, nLists: Int,
      sampleSize: Int = 2048, iterations: Int = 8, seed: Long = 42L): Array[Array[Float]] = {
    // null vectors carry no geometry and would NPE the collect — skip
    // them here; an all-null corpus then hits the empty-corpus refusal
    val sample = emb.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .orderBy(hash(col(vecCol), lit(seed.toInt)))
      .limit(sampleSize)
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    // ragged dims are CLAMPED everywhere (trainer, NearestCellExpr,
    // CellAngleExpr — prefix-distance semantics, pinned in specs), which
    // silently absorbs a genuinely mis-dimensioned corpus; surface it
    // once here, where the dims are cheap to observe, so the data bug
    // is visible without changing the clamp contract
    val dims = sample.iterator.map(_.length).toSet
    if (dims.size > 1)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"IVF training sample has ragged vector dims $dims - assignments " +
          "use prefix (clamped) distances; check the embedding pipeline")
    val k = math.min(nLists, sample.length)
    // deterministic init: evenly spaced sample points
    var centroids = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    for (_ <- 0 until iterations) {
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bd = Double.MaxValue
        for (c <- 0 until k) { val d = dist2(v, centroids(c)); if (d < bd) { bd = d; best = c } }
        counts(best) += 1
        val s = sums(best)
        // same ragged-dim clamp as dist2: a sample vector longer than the
        // accumulator (sized off the first sample row) must not overrun it
        var i = 0
        val n = if (v.length < s.length) v.length else s.length
        while (i < n) { s(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
    }
    centroids
  }

  /** Assign every vector to its nearest centroid cell. Assignment is the
    * codegen'd [[graft.functions.NearestCellExpr]] (same argmin/dist2
    * arithmetic as the trainer, no UDF boundary on the corpus pass). */
  def build(emb: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 16): IvfIndex = {
    val centroids = trainCentroids(emb, vecCol, nLists)
    val cells = emb.select(col(idCol), col(vecCol),
      graft.functions.NearestCellExpr(col(vecCol), centroids).as("cell"))
    IvfIndex(cells, centroids)
  }

  /** The `nProbe` cells nearest the query — the ONE derivation of the
    * cell-probe policy, shared by [[topK]] and the oracle export (which
    * dumps it so DuckDB can recheck the candidate set and ranking). */
  def probeCells(index: IvfIndex, query: Array[Float], nProbe: Int = 4): Seq[Int] =
    index.centroids.indices
      .sortBy(c => dist2(query, index.centroids(c)))
      .take(nProbe)

  /** Approximate top-k: exact cosine within the nProbe nearest cells. */
  def topK(index: IvfIndex, idCol: String, vecCol: String,
      query: Array[Float], k: Int, nProbe: Int = 4): DataFrame = {
    val byDist = probeCells(index, query, nProbe)
    index.cells.filter(col("cell").isin(byDist: _*))
      .select(col(idCol), round(Similarity.cosine(col(vecCol), lit(query)), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
