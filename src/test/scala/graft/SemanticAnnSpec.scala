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
}
