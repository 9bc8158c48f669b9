package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empty- and all-null-input sweep across the pipeline operators: every
  * op must either return a clean empty/null-propagating result or
  * refuse with a documented IllegalArgumentException — never NPE,
  * MatchError, or a Spark analysis error. This is the bug class edge
  * audits keep finding one-off (empty score chain, ragged dims); the
  * sweep pins the whole surface at once. */
class EdgeSweepSpec extends SparkSpec {
  import graft.ops._

  private lazy val emptyDocs: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }
  private lazy val nullDocs: DataFrame = {
    import spark.implicits._
    Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
  }
  private lazy val emptyVecs: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  }
  private lazy val nullVecs: DataFrame = {
    import spark.implicits._
    Seq((1L, Option.empty[Array[Float]]), (2L, Option.empty[Array[Float]]))
      .toDF("vec_id", "embedding")
  }

  /** Run the op; clean result or a documented refusal both pass. */
  private def sweep(name: String)(body: => Unit): Unit =
    try body
    catch {
      case _: IllegalArgumentException => () // documented refusal
      case e: Throwable =>
        fail(s"$name blew up on edge input: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  test("doc ops survive empty and all-null text") {
    for ((tag, docs) <- Seq("empty" -> emptyDocs, "null" -> nullDocs)) {
      sweep(s"quality/$tag") {
        docs.select(TextAnalysis.qualityScore(col("text"))).collect(); () }
      sweep(s"langid/$tag") {
        docs.select(TextAnalysis.languageId(col("text"))).collect(); () }
      sweep(s"repetition/$tag") {
        TextAnalysis.repetitionStats(docs, "doc_id", "text").collect(); () }
      sweep(s"chunks/$tag") {
        TextAnalysis.chunkSpans(docs, "doc_id", "text").collect(); () }
      sweep(s"minhash/$tag") {
        Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.8).collect(); () }
      sweep(s"jaccard/$tag") {
        Dedup.tokenJaccardPairs(docs, "doc_id", "text", 0.5).collect(); () }
      sweep(s"exactDedup/$tag") {
        Dedup.keepCanonical(docs, "doc_id", "text").collect(); () }
      sweep(s"pii/$tag") {
        Redaction.piiStats(docs, "doc_id", "text").collect(); () }
      sweep(s"epochs/$tag") {
        Sampling.epochRepeat(docs.withColumn("grp", lit("g")), "doc_id", "grp",
          Map("g" -> 1.5)).collect(); () }
      sweep(s"shards/$tag") {
        Shards.trainingShuffle(docs, "doc_id", 4).collect(); () }
      sweep(s"mixture/$tag") {
        Sampling.mixtureSample(docs.withColumn("grp", lit("g")), "doc_id", "grp",
          Map("g" -> 0.5)).collect(); () }
    }
  }

  test("every query shape answers cleanly over an empty store") {
    val dir = java.nio.file.Files.createTempDirectory("graft-edge-api").toString
    val nt = s"$dir/data.nt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nt), "")
    val bk = new graft.api.Bikidata(spark, s"$dir/wh")
    assert(bk.build(Seq(nt)) === 0)
    assert(bk.total() === 0)
    // each representative shape must return a valid (empty) envelope,
    // not throw out of an empty dict/index/pref table
    val shapes = Seq(
      """{"filters":[{"p":"<urn:p>","o":"<urn:o>"}]}""",
      """{"filters":[{"p":"<urn:p>"}]}""",
      """{"filters":[{"o":"<urn:o>"}]}""",
      """{"filters":[{"p":"fts","o":"anything"}]}""",
      """{"filters":[{"p":"regex","o":"ab.*"}]}""",
      """{"filters":[{"p":"random 5"}]}""",
      """{"filters":[{"p":"<urn:p>","o":"<urn:o>"}],"facets":["<urn:f>"]}""",
      """{"filters":[{"p":"<urn:p>","o":"<urn:o>"}],"facets":["properties","graphs"]}""",
      """{"filters":[{"p":"<urn:p>","o":"<urn:o>"}],"order":[{"type":"label"}]}""",
      """{"filters":[{"p":"<urn:p>","o":"<urn:o>"}],"order":[{"type":"natural"}]}""",
      """{"filters":[{"p":"paths <urn:p>","id":"<urn:s>"}]}""")
    shapes.foreach { s =>
      sweep(s"empty-store $s") {
        val r = bk.queryJson(s, useCache = false)
        assert(r.contains("\"total\""), s"no envelope for $s: $r")
      }
    }
    sweep("empty-store sp") { bk.sp(Seq("<urn:s>")).collect(); () }
    sweep("empty-store spo") { bk.spo(s = Some("<urn:s>")).collect(); () }
  }

  test("embedding ops survive empty and all-null vectors") {
    for ((tag, vecs) <- Seq("empty" -> emptyVecs, "null" -> nullVecs)) {
      sweep(s"knn/$tag") {
        Similarity.topK(vecs, "vec_id", "embedding", Array(1f, 0f), 5).collect(); () }
      sweep(s"pairs/$tag") {
        Dedup.embeddingPairs(vecs, "vec_id", "embedding", 0.5).collect(); () }
      sweep(s"lsh/$tag") {
        Similarity.buildLsh(vecs, "vec_id", "embedding").collect(); () }
      sweep(s"quant/$tag") {
        Quantize.int8(vecs, "vec_id", "embedding").collect(); () }
      // fit/build REFUSE an empty/all-null corpus (documented) — the
      // sweep asserts the refusal is an IllegalArgumentException,
      // never an NPE out of a null sample row
      sweep(s"pca/$tag") { Pca.fit(vecs, "embedding", k = 2); () }
      sweep(s"ivf/$tag") { Ivf.build(vecs, "vec_id", "embedding"); () }
      sweep(s"semdedup/$tag") {
        Similarity.semDedupKeep(vecs, "vec_id", "embedding", 0.5).collect(); () }
    }
  }
}
