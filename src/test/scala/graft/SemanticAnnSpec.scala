package graft

import graft.algebra.{FilterCompiler, FilterQ}
import graft.semantic.{HashingEmbedder, SemanticAnn}
import org.apache.spark.sql.functions._

/** The ANN cell index must be LOSSLESS for threshold queries: pruned
  * cells provably cannot contain a match, so ANN results are identical
  * to the brute scan — not merely high-recall. */
class SemanticAnnSpec extends SparkSpec {
  import spark.implicits._

  private val embedder = HashingEmbedder(64)

  // clustered corpus: a few topic seeds with token-level perturbations,
  // plus an empty text (zero vector) to exercise the -1 cell
  private lazy val corpus: Seq[(Long, String)] = {
    val topics = Seq(
      "regional supplier network europe logistics",
      "customer order lineitem shipment invoice",
      "astronomy telescope galaxy nebula cluster",
      "cooking recipe salad tomato basil olive")
    val rows = for {
      (t, ti) <- topics.zipWithIndex
      i <- 0 until 50
    } yield ((ti * 50 + i).toLong, s"$t variant$i ${"pad " * (i % 5)}")
    rows :+ (999L, "")
  }

  private lazy val sem = {
    val texts = corpus
    val vecs = embedder.embed(texts.map(_._2))
    texts.map(_._1).zip(vecs).toDF("hash", "vec")
  }

  private lazy val ann = SemanticAnn.build(sem, nLists = 8)

  private def bruteMatches(q: Array[Float], maxDist: Double): Set[Long] =
    sem.withColumn("d", graft.functions.CosineDistance(col("vec"), lit(q)))
      .filter(col("d") < maxDist).select("hash")
      .collect().map(_.getLong(0)).toSet

  private def annMatches(q: Array[Float], maxDist: Double): Set[Long] =
    ann.candidates(q, maxDist)
      .withColumn("d", graft.functions.CosineDistance(col("vec"), lit(q)))
      .filter(col("d") < maxDist).select("hash")
      .collect().map(_.getLong(0)).toSet

  test("ann threshold results equal brute scan for every query") {
    val queries = Seq(
      "regional supplier logistics",             // near topic 0
      "astronomy galaxy nebula",                 // near topic 2
      "recipe salad basil",                      // near topic 3
      "completely unrelated quantum xylophone",  // likely no matches
      "customer order invoice shipment")
    for (qt <- queries) {
      val q = embedder.embedOne(qt)
      val brute = bruteMatches(q, 0.5)
      assert(annMatches(q, 0.5) === brute, s"query '$qt'")
    }
    // at least one query must actually find matches or the test is vacuous
    assert(bruteMatches(embedder.embedOne("regional supplier logistics"), 0.5).nonEmpty)
  }

  test("pruning skips cells for a focused query") {
    val q = embedder.embedOne("astronomy telescope galaxy")
    val probed = ann.probeCells(q, 0.5)
    assert(probed.nonEmpty)
    assert(probed.size < ann.centroids.length,
      s"probed all ${probed.size} cells — no pruning")
  }

  test("zero-norm query matches nothing, like the brute path") {
    val z = new Array[Float](64)
    assert(ann.probeCells(z, 0.5).isEmpty)
    assert(annMatches(z, 0.5).isEmpty)
    assert(bruteMatches(z, 0.5).isEmpty)
  }

  test("engine semantic filter gives identical rows with and without ann") {
    val ctx = graft.rdfize.Rdfize.semantic(spark, "/root/testdata/sf0.001")
    assert(ctx.semanticAnn.nonEmpty)
    def rows(c: graft.algebra.EngineContext): Seq[(Long, Double)] =
      FilterCompiler.compile(c, FilterQ(p = "semantic", o = "NATION_3 NATION_3"),
          withScore = true).get
        .orderBy("s").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val withAnn = rows(ctx)
    val brute = rows(ctx.copy(semanticAnn = None))
    assert(withAnn === brute)
    assert(withAnn.nonEmpty)
  }

  // --- CellAngleExpr: the codegen assignment pass the ANN build runs ---

  /** Spec-local reference for what the former assignUdf computed. */
  private def refAssign(v: Array[Float], cs: Array[Array[Float]]): (Int, Double) = {
    val norm = v.foldLeft(0.0)((a, x) => a + x.toDouble * x)
    if (norm == 0.0) return (-1, 0.0)
    var best = 0; var bd = Double.MaxValue
    for (c <- cs.indices) {
      var d = 0.0; var j = 0
      val n = math.min(v.length, cs(c).length)
      while (j < n) { val x = v(j).toDouble - cs(c)(j); d += x * x; j += 1 }
      if (d < bd) { bd = d; best = c }
    }
    val cvec = cs(best)
    var dot = 0.0; var nv = 0.0; var nc = 0.0
    var i = 0
    val n = math.min(v.length, cvec.length)
    while (i < n) {
      dot += v(i).toDouble * cvec(i); nv += v(i).toDouble * v(i)
      nc += cvec(i).toDouble * cvec(i); i += 1
    }
    val a = if (nv == 0.0 || nc == 0.0) Double.NaN
      else math.acos(math.max(-1.0, math.min(1.0, dot / math.sqrt(nv * nc))))
    (best, if (a.isNaN) 0.0 else a)
  }

  test("CellAngleExpr: nearest cell + angle match the reference assignment") {
    val cs = Array(
      Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f),
      Array(0.5f, 0.5f, 0f))
    val vecs: Seq[Array[Float]] = Seq(
      Array(0.9f, 0.1f, 0f),
      Array(0.1f, 0.9f, 0.05f),
      Array(0f, 0f, 2f),
      Array(0.5f, 0.5f, 0f),   // exact centroid hit -> angle 0
      Array(0f, 0f, 0f),       // zero vector -> cell -1
      Array(-1f, -1f, -1f),
      Array(0.4f, 0.4f, 0.1f, 7f), // LONGER than centroids: clamp rule
      Array(0.7f))                 // shorter than centroids
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("hash", "vec")
      .select(col("hash"),
        graft.functions.CellAngleExpr(col("vec"), cs).as("ca"))
      .select(col("hash"), col("ca.cell"), col("ca.angle"))
    val got = df.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val (ec, ea) = refAssign(v, cs)
      val (gc, ga) = got(i.toLong)
      assert(gc === ec, s"cell for vec $i")
      assert(math.abs(ga - ea) < 1e-12, s"angle for vec $i")
    }
    // the zero vector really landed in -1 and the centroid hit at angle 0
    assert(got(4L)._1 === -1)
    assert(got(3L)._2 === 0.0)
  }

  test("ragged-dim corpus: trainer and assignment clamp, never throw") {
    // first sample row short, later rows longer -- the accumulation loop
    // used to index past the sums array (round-7 advice item)
    val ragged: Seq[(Long, Seq[Float])] = (0L until 40L).map { i =>
      val len = if (i % 3 == 0) 3 else if (i % 3 == 1) 5 else 8
      (i, Array.tabulate(len)(j => (i + j + 1).toFloat / 10f).toSeq)
    }
    val df = ragged.toDF("hash", "vec")
    val cents = graft.ops.Ivf.trainCentroids(df, "vec", nLists = 4)
    assert(cents.nonEmpty)
    // every assignment is a valid cell under the clamp rule
    val cells = df.select(
        graft.functions.CellAngleExpr(col("vec"), cents).as("ca"))
      .select(col("ca.cell")).collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < cents.length))
    // NearestCellExpr agrees with CellAngleExpr's cell on nonzero vectors
    val both = df.select(
        graft.functions.NearestCellExpr(col("vec"), cents).as("nc"),
        col("vec"))
      .select(col("nc"),
        graft.functions.CellAngleExpr(col("vec"), cents).as("ca"))
      .select(col("nc"), col("ca.cell").as("cc")).collect()
    both.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("ANN build over a corpus with zero vectors serves exactly (codegen path)") {
    // the rebuilt ANN (now assigned via CellAngleExpr) must keep the
    // lossless-threshold contract including the -1 cell for zero vectors
    val q = embedder.embed(Seq("astronomy telescope galaxy nebula cluster")).head
    assert(annMatches(q, 0.5) === bruteMatches(q, 0.5))
    val zeroCell = ann.cells.filter(col("cell") === -1).count()
    assert(zeroCell === 1L) // the empty-text doc
  }

  test("CellAngleExpr on ARRAY<DOUBLE> input matches the float branch") {
    val cs = Array(Array(1f, 0f), Array(0f, 1f))
    val vecs = Seq(Seq(0.9, 0.1), Seq(0.2, 0.8), Seq(0.0, 0.0))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("hash", "vec")
      .select(col("hash"), graft.functions.CellAngleExpr(col("vec"), cs).as("ca"))
      .select(col("hash"), col("ca.cell"), col("ca.angle"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(df(0L)._1 === 0)
    assert(df(1L)._1 === 1)
    assert(df(2L) === ((-1, 0.0)))
    val (c0, a0) = refAssign(Array(0.9f, 0.1f), cs)
    assert(df(0L)._1 === c0)
    assert(math.abs(df(0L)._2 - a0) < 1e-7) // float-vs-double input rounding only
  }
}
