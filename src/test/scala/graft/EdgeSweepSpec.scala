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
      sweep(s"dupStrip/$tag") {
        Decontam.stripDupSpans(docs, "doc_id", "text").collect(); () }
      sweep(s"dsir/$tag") {
        Dsir.resample(docs, docs, "doc_id", "text", tauE4 = 0L).collect(); () }
      sweep(s"qualityLr/$tag") {
        // an empty/all-null labeled set must REFUSE (documented), not fit
        val m = QualityClassifier.train(
          docs.withColumn("label", lit(1)), "doc_id", "text", "label",
          buckets = 64, iters = 2)
        QualityClassifier.score(docs, m, "doc_id", "text").collect(); () }
      sweep(s"clusterCap/$tag") {
        Similarity.capPerCluster(
          if (tag == "empty") emptyVecs else nullVecs,
          "vec_id", "embedding", nLists = 2, cap = 3).collect(); () }
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

  test("stripDupSpans refuses a pathological megadoc loudly, under the cap passes") {
    import spark.implicits._
    val mega = (1 to 120).map(i => s"tok${i % 40}").mkString(" ")
    val docs = Seq((1L, mega), (2L, mega)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Decontam.stripDupSpans(docs, "doc_id", "text", maxTokens = 50).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(chain.contains("maxTokens"),
      s"megadoc refusal must name the bound, got:\n$chain")
    // the same corpus under the cap flows through normally
    val ok = Decontam.stripDupSpans(docs, "doc_id", "text", maxTokens = 200)
      .collect()
    assert(ok.isEmpty, "two identical docs strip to nothing (all spans dup)")
  }

  test("adversarial unicode text flows through the text ops deterministically") {
    import spark.implicits._
    // emoji (surrogate pairs), RTL, combining marks, zero-width chars,
    // control chars, a 10k-char single token, mixed scripts, lone
    // accents — the content a real web corpus actually contains
    val nasty = Seq(
      1L -> "😀😀 emoji soup 🍕",
      2L -> "مرحبا rtl text mixed with latin",
      3L -> "combining áéí marks",
      4L -> "zero​width‍joined text",
      5L -> ("x" * 10000),
      6L -> "tabs\tand\nnewlines\rand\u0000nulls",
      7L -> "ＦＵＬＬＷＩＤＴＨ ｌａｔｉｎ",
      8L -> "ελληνικά και 中文 และไทย",
      9L -> "", 10L -> "   ", 11L -> "́́")
    val docs = nasty.toDF("doc_id", "text")
    // row-local text ops: no throw, and bit-stable across reruns
    def snapshot() = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.languageId(col("text")).as("lang"),
        TextAnalysis.tokenCount(col("text")).as("toks"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpe"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .collect().map(_.toString).toSeq
    val s1 = snapshot()
    assert(s1 === snapshot(), "text stats not deterministic on unicode edges")
    sweep("nasty/winnow") {
      TextAnalysis.winnowMd5Fingerprints(docs, "doc_id", "text").collect(); () }
    sweep("nasty/chunks") {
      TextAnalysis.chunkSpans(docs, "doc_id", "text").collect(); () }
    sweep("nasty/minhash") {
      Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.8).collect(); () }
    sweep("nasty/pii") { Redaction.piiStats(docs, "doc_id", "text").collect(); () }
    // the FTS build + a surrogate-pair query term must round-trip
    sweep("nasty/fts") {
      val idx = graft.fts.FtsIndex.build(
        docs.select(col("doc_id").as("hash"), col("text").as("value")))
      idx.matchBm25("emoji").collect()
      idx.matchBm25("😀").collect(); ()
    }
  }

  test("empty streaming micro-batches are harmless no-ops") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-edge-stream").toString
    val (state, out) = (s"$root/state", s"$root/out")
    val b1 = Seq((1L, "the quick brown fox jumps over the lazy dog today")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    def run(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      graft.streaming.Streaming.nearDedupBatch(spark, b, "doc_id", "text",
        state, out, id, 0.6, 64, 3, 16)
    sweep("stream/empty-first") { run(empty, 0) }
    run(b1, 1)
    sweep("stream/empty-mid") { run(empty, 2) }
    val admitted = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted === Set(1L),
      "empty micro-batches must not add or drop admitted docs")
  }

  test("concurrent queryJson calls stay isolated and identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-edge-conc").toString
    val nt = s"$dir/data.nt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nt),
      (0 until 20).map(i =>
        s"""<urn:c:s$i> <http://www.w3.org/2000/01/rdf-schema#label> "item $i" .""")
        .mkString("", "\n", "\n"))
    val bk = new graft.api.Bikidata(spark, s"$dir/wh")
    assert(bk.build(Seq(nt)) === 20)
    // 8 threads × 10 calls over 4 distinct shapes: every response must
    // equal the single-threaded answer for ITS shape (no cross-talk
    // through the result cache or shared session state)
    val shapes = (0 until 4).map(i =>
      s"""{"filters":[{"p":"<http://www.w3.org/2000/01/rdf-schema#label>"}],"size":${i + 2}}""")
    val expect = shapes.map(s => s -> bk.queryJson(s, useCache = false)).toMap
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val calls = Future.sequence((0 until 80).map { i =>
      val s = shapes(i % 4)
      Future(s -> bk.queryJson(s, useCache = i % 2 == 0))
    })
    Await.result(calls, 120.seconds).foreach { case (s, r) =>
      assert(r === expect(s), s"concurrent response diverged for $s")
    }
  }

  test("boundary parameter values: degenerate but legal, or a documented refusal") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"tok$i " * i.toInt, i)).toDF("doc_id", "text", "toks")
    val vecs = (1L to 6L).map(i => (i, Array(0.1f * i, 1f))).toDF("vec_id", "embedding")
    // budget smaller than any doc: every doc spans its own bins / bin
    sweep("pack-budget-1") {
      val chunks = Packing.packChunks(docs, "doc_id", "toks", budget = 1L, shards = 2)
      assert(chunks.count() === (1L to 6L).sum) // one bin per token
      val whole = Packing.packWhole(docs, "doc_id", "toks", budget = 1L, shards = 2)
      assert(whole.count() === 6L) // oversize docs get a bin of their own
    }
    sweep("shuffle-1-shard") {
      val got = Shards.trainingShuffle(docs, "doc_id", nShards = 1)
        .collect().map(r => (r.getLong(3), r.getLong(4)))
      assert(got.forall(_._1 == 0L) && got.map(_._2).sorted.toSeq === (1L to 6L))
    }
    sweep("topk-0") {
      assert(Similarity.topK(vecs, "vec_id", "embedding", Array(1f, 0f), 0).count() === 0L)
    }
    sweep("semdedup-impossible-threshold") {
      // cosine is capped at 1: nothing pairs, everything survives
      assert(Similarity.semDedupKeep(vecs, "vec_id", "embedding",
        threshold = 1.01, nLists = 2).count() === 6L)
    }
    sweep("stratified-k-1") {
      val got = graft.ops.Sampling.stratifiedSample(
        docs.withColumn("grp", col("doc_id") % 2), "doc_id", "grp", k = 1)
      assert(got.count() === 2L)
    }
    // documented refusals stay IllegalArgumentException, never deeper errors
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.mixtureSample(docs, "doc_id", "text", Map("a" -> 1.5)) }
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.epochRepeat(docs, "doc_id", "text", Map("a" -> 5000.0)) }
    intercept[IllegalArgumentException] { Shards.trainingShuffle(docs, "doc_id", 0) }
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.planMixture(Map("a" -> 0L), budget = 10L) }
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
