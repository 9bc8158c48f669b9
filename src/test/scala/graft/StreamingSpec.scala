package graft

import graft.streaming.Streaming
import graft.streaming.Streaming.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val sample = Seq(
    Event(1, ts(5), 1, "click", 1.0),
    Event(2, ts(10), 1, "click", 2.0),
    Event(3, ts(65), 1, "view", 3.0),
    Event(4, ts(8), 2, "click", 4.0),
    // user 1 returns after a >30min gap -> second session
    Event(5, ts(120), 1, "click", 5.0))

  test("hourlyEventStats: stream result equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.hourlyEventStats(mem.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    mem.addData(sample.take(3))
    q.processAllAvailable()
    mem.addData(sample.drop(3))
    q.processAllAvailable()
    val streamed = spark.table("hourly").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    val batch = Streaming.hourlyEventStats(sample.toDF()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    // 2024-01-01T00:00:00Z == epoch 1704067200
    assert(batch.contains((1704067200L, "click", 3L)))
  }

  test("sessionize splits on the inactivity gap") {
    val sessions = Streaming.sessionize(sample.toDS(), gapMinutes = 30)
      .collect().sortBy(s => (s.user_id, s.startMs))
    assert(sessions.map(s => (s.user_id, s.events)).toSeq ===
      Seq((1L, 2), (1L, 1), (1L, 1), (2L, 1)))
    // first session of user 1 spans events 1-2 (5min gap), 65min is separate
    assert(sessions(0).endMs - sessions(0).startMs === 5 * 60 * 1000L)
  }

  test("corpus-stats aggregation runs identically under streaming (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.TextAnalysis
    val rows = Seq((1L, "a b c"), (2L, (1 to 40).map(_ => "w").mkString(" ")),
      (3L, "x y"))
    val mem = MemoryStream[(Long, String)]
    val q = TextAnalysis.lengthHistogram(mem.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode("complete").start()
    mem.addData(rows.take(2)); q.processAllAvailable()
    mem.addData(rows.drop(2)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hist_stream").collect().map(_.toSeq).toSet
    val batch = TextAnalysis.lengthHistogram(rows.toDF("doc_id", "text"), "text")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("stateless curation chain (normalize → blocklist → mixture) streams unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.{Sampling, TextAnalysis, Urls}
    import org.apache.spark.sql.DataFrame
    // the row-local ops are stateless, so the SAME DataFrame code runs
    // under Structured Streaming append mode with no rewrite — pinned
    // here so a future refactor cannot sneak in a batch-only construct
    // (a window, a global sort) without this test going red
    def chain(df: DataFrame): DataFrame =
      Sampling.mixtureSample(
        Urls.filterBlockedDomains(
          df.withColumn("text", TextAnalysis.normalizeText(col("text"))),
          "url", Seq("blocked.com")),
        "id", "src", Map("a" -> 0.5), salt = "sc")
    val rows = (1L to 60L).map(i => (i,
      if (i % 5 == 0) s"http://x$i.blocked.com/p" else s"http://ok$i.org/p",
      if (i % 2 == 0) "a" else "b", s"Text  “$i”"))
    val mem = MemoryStream[(Long, String, String, String)]
    val q = chain(mem.toDF().toDF("id", "url", "src", "text"))
      .writeStream.format("memory").queryName("cur_stream")
      .outputMode("append").start()
    mem.addData(rows.take(25)); q.processAllAvailable()
    mem.addData(rows.drop(25)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cur_stream").collect().map(_.toSeq).toSet
    val batch = chain(rows.toDF("id", "url", "src", "text"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("streaming sessionize emits each session exactly once (event-time timeout)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.sessionize(mem.toDS(), gapMinutes = 30, lateness = "10 minutes")
      .toDF().writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    // user 1: two events 5 min apart -> ONE session; must not be emitted
    // per-batch while open
    mem.addData(Seq(Event(1, ts(5), 1, "click", 1.0)))
    q.processAllAvailable()
    mem.addData(Seq(Event(2, ts(10), 1, "click", 2.0)))
    q.processAllAvailable()
    assert(spark.table("sess_stream").count() === 0) // still open, nothing emitted
    // advance the watermark past last(10) + gap(30) + lateness(10): an
    // unrelated user's late event at t=120 sets watermark to 110
    mem.addData(Seq(Event(3, ts(120), 2, "click", 3.0)))
    q.processAllAvailable()
    // the timeout fires on the NEXT batch after the watermark advances
    mem.addData(Seq(Event(4, ts(125), 2, "click", 4.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_stream").collect()
      .map(r => (r.getLong(0), r.getInt(3))).toSeq
    assert(rows === Seq((1L, 2))) // exactly one closed session, 2 events
  }

  test("streaming dedup with watermark drops same-text rows with different timestamps") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = Streaming.dedupStream(mem.toDF().toDF("doc_id", "ts", "text"),
        "text", eventTimeCol = Some("ts"), lateness = "1 hour")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    mem.addData(Seq(
      (1L, ts(0), "same doc body"),
      (2L, ts(5), "same doc body"),   // same text, DIFFERENT ts -> dropped
      (3L, ts(6), "other content")))
    q.processAllAvailable()
    mem.addData(Seq((4L, ts(20), "same doc body"))) // later batch, in window
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_wm").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L))
  }

  test("nearDedupStream batches equal the batch greedy twin; replays are idempotent") {
    import graft.ops.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    val (state, out) = (s"$root/state", s"$root/out")
    // long bases so 3-word-shingle Jaccard behaves; B extends A, C
    // extends B (a near-dup CHAIN under threshold 0.6), unrelated fillers
    val tA = "the quick brown fox jumps over the lazy dog near the wide river bank today"
    val tB = tA + " while the morning sun climbs slowly above the misty eastern hills"
    val tC = tB + " and distant church bells ring across the quiet sleeping village below"
    val tU1 = "columnar execution engines vectorize analytical query operators across partitioned parquet files"
    val tU2 = "alpine glaciers retreat measurably every summer as freezing lines rise higher"
    val b1 = Seq((1L, tA), (2L, tU1)).toDF("doc_id", "text")
    val b2 = Seq((3L, tB), (4L, tA), (5L, tU2)).toDF("doc_id", "text") // 4 = exact dup of 1
    val b3 = Seq((6L, tC), (7L, tU1)).toDF("doc_id", "text")           // 7 = exact dup of 2
    val th = 0.6
    def run(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      Streaming.nearDedupBatch(spark, batch, "doc_id", "text", state, out,
        id, th, 64, 3, 16)
    def admittedIds = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    run(b1, 0); run(b2, 1)
    // at-least-once redelivery: replaying a batch against the same prior
    // state overwrites its subdir with identical content
    val afterTwo = admittedIds
    run(b2, 1)
    assert(admittedIds === afterTwo)
    run(b3, 2)
    val got = admittedIds
    // certain regardless of band luck: exact dups are killed cross-batch
    assert(!got.contains(4L) && !got.contains(7L))
    assert(got.contains(1L) && got.contains(2L) && got.contains(5L))
    // STRICT stream==batch parity: same sketches, same verify, same
    // greedy walk over the concatenation (arrival order = id order)
    val all = b1.union(b2).union(b3)
    val twin = Dedup.greedyKeepFromPairs(all, "doc_id",
        Dedup.minhashDedup(all, "doc_id", "text", threshold = th))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === twin)
  }

  test("nearDedupStream == batch greedy twin on random corpora and batch splits") {
    import graft.ops.Dedup
    // deterministic sketches mean stream admission must equal the batch
    // twin for ANY corpus and ANY micro-batch partition — sweep seeded
    // random corpora (planted exact dups, extension near-dup chains,
    // unique fillers) through random ordered batch splits
    val rnd = new scala.util.Random(7)
    val words = Vector("river", "engine", "glacier", "signal", "harbor",
      "meadow", "circuit", "lantern", "orchard", "granite", "thermal", "willow")
    def sentence(): String =
      Seq.fill(14 + rnd.nextInt(6))(words(rnd.nextInt(words.length))).mkString(" ")
    for (trial <- 1 to 5) {
      val root = java.nio.file.Files.createTempDirectory(s"graft-ndp$trial").toString
      val (state, out) = (s"$root/state", s"$root/out")
      // build 8-14 docs: ~1/3 fresh, ~1/3 exact dups of earlier docs,
      // ~1/3 extensions of earlier docs (near-dup chains)
      val texts = scala.collection.mutable.ArrayBuffer[String]()
      val n = 8 + rnd.nextInt(7)
      while (texts.length < n) {
        if (texts.isEmpty) texts += sentence()
        else rnd.nextInt(3) match {
          case 0 => texts += sentence()
          case 1 => texts += texts(rnd.nextInt(texts.length))
          case _ => texts += texts(rnd.nextInt(texts.length)) + " " +
            words(rnd.nextInt(words.length)) + " " + words(rnd.nextInt(words.length))
        }
      }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq
      // random ordered split into 2-4 micro-batches (arrival = id order)
      val nb = 2 + rnd.nextInt(3)
      val cuts = (Seq(0, docs.length) ++
        Seq.fill(nb - 1)(1 + rnd.nextInt(docs.length - 1))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => docs.slice(a, b) }
      val th = 0.6
      batches.zipWithIndex.foreach { case (b, i) =>
        Streaming.nearDedupBatch(spark, b.toDF("doc_id", "text"), "doc_id",
          "text", state, out, i.toLong, th, 64, 3, 16)
      }
      val got = spark.read.parquet(out)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val all = docs.toDF("doc_id", "text")
      val twin = Dedup.greedyKeepFromPairs(all, "doc_id",
          Dedup.minhashDedup(all, "doc_id", "text", threshold = th))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === twin,
        s"trial $trial: stream admission diverged from the batch twin " +
          s"(batches=${batches.map(_.length).mkString(",")}, docs=$docs)")
    }
  }

  test("nearDedupStream wrapper: micro-batches flow through foreachBatch state") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-neardup-w").toString
    val mem = MemoryStream[(Long, String)]
    val base = "the quick brown fox jumps over the lazy dog near the wide river bank today"
    val q = Streaming.nearDedupStream(spark, mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$root/state", s"$root/out", s"$root/ckpt", threshold = 0.6)
    mem.addData(Seq((1L, base), (2L, "unrelated columnar engine prose")))
    q.processAllAvailable()
    mem.addData(Seq((3L, base), (4L, "alpine glacier retreat measurements")))
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(s"$root/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 3 is an exact dup of 1 arriving a batch later: killed by state
    assert(kept === Set(1L, 2L, 4L))
  }

  test("dedupStream drops duplicate texts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.dedupStream(mem.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    mem.addData(Seq((1L, "alpha beta"), (2L, "gamma  delta"), (3L, "alpha beta")))
    q.processAllAvailable()
    // duplicate arrives again in a LATER batch — state must remember it
    mem.addData(Seq((4L, "Alpha   Beta"), (5L, "epsilon")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup").collect().map(_.getLong(0)).toSet
    // 3 (same batch), 4 (later batch, differs only in case/whitespace) dropped
    assert(ids === Set(1L, 2L, 5L))
    // batch mode: same semantics, first occurrence kept
    val batch = Streaming.dedupStream(
      Seq((1L, "x y"), (2L, "x  Y"), (3L, "z")).toDF("doc_id", "text"), "text")
      .collect().map(_.getLong(0)).toSet
    assert(batch.size === 2 && batch.contains(3L))
  }

  test("text-pipeline transforms run identically under streaming") {
    // the quality/token/langid columns are pure row-local expressions, so
    // the SAME transform function must produce the SAME rows whether the
    // source is a stream or a batch — the streaming=batch claim for the
    // curation pipeline
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.TextAnalysis
    def score(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("toks"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.languageId(col("text")).as("lang"),
        graft.ops.Redaction.redact(col("text")).as("redacted"),
        graft.ops.Redaction.emailCount(col("text")).as("n_emails"))
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away"),
      (2L, "!!! ??? ###"),
      (3L, "der Hund und die Katze sind nicht im Haus mit den Kindern"),
      (4L, "mail me at someone@example.com or ping 10.0.0.1 today"))
    val mem = MemoryStream[(Long, String)]
    val q = score(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("textpipe")
      .outputMode("append").start()
    mem.addData(rows)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("textpipe").collect().map(_.toSeq).toSet
    val batch = score(rows.toDF("doc_id", "text")).collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.size === 4)
    assert(streamed.exists(_.contains("mail me at [EMAIL] or ping [IP] today")))
  }

  test("streamNt ingests micro-batches into warehouse deltas") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val watch = s"$dir/watch"; val wh = s"$dir/wh"; val ckpt = s"$dir/ckpt"
    new java.io.File(watch).mkdirs()
    val q = Streaming.streamNt(spark, watch, wh, ckpt)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(watch, "batch1.nt"),
      "<http://ex/a> <http://ex/p> \"v1\" .\n<http://ex/b> <http://ex/p> <http://ex/a> .\n")
    q.processAllAvailable()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(watch, "batch2.nt"),
      "<http://ex/c> <http://ex/p> \"v2\" .\n")
    q.processAllAvailable()
    q.stop()
    val graph = new graft.store.Warehouse(spark, wh).load()
    assert(graph.triples.count() === 3)
    val lits = graph.literals.select("value").collect().map(_.getString(0)).toSet
    assert(lits === Set("\"v1\"", "\"v2\""))
    // streamed hashes must equal batch-side hashing of the same terms
    assert(graph.iris.filter(col("value") === "<http://ex/a>").count() === 1)
  }

  test("streamNt marks streamed subjects semantic-stale; repair catches up") {
    import graft.semantic.{HashingEmbedder, SemanticMaintenance}
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sem").toString
    val watch = s"$dir/watch"; val whDir = s"$dir/wh"; val ckpt = s"$dir/ckpt"
    new java.io.File(watch).mkdirs()
    // seed store + semantic index through the facade
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/seed.nt"),
      "<http://ex/a> <http://www.w3.org/2000/01/rdf-schema#label> \"alpha ember\" .\n")
    val bk = new graft.api.Bikidata(spark, whDir)
    bk.build(Seq(s"$dir/seed.nt"))
    bk.buildSemantic()
    assert(new java.io.File(s"$whDir/literals_semantic").exists())
    // stream a batch touching an EXISTING subject and a new one
    val q = Streaming.streamNt(spark, watch, whDir, ckpt)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(watch, "b1.nt"),
      "<http://ex/a> <http://www.w3.org/2000/01/rdf-schema#label> \"alpha glow\" .\n" +
      "<http://ex/d> <http://www.w3.org/2000/01/rdf-schema#label> \"delta spark\" .\n")
    q.processAllAvailable()
    q.stop()
    // the batch marked BOTH subjects stale instead of dropping the index
    assert(new java.io.File(s"$whDir/literals_semantic").exists(),
      "stream must not drop a maintainable semantic index")
    assert(new java.io.File(s"$whDir/semantic_stale").exists(),
      "streamed subjects must be marked stale")
    // repair against the post-stream graph converges to a full rebuild
    val g = new graft.store.Warehouse(spark, whDir).load()
    assert(SemanticMaintenance.repair(spark, whDir, g.triples, g.literals,
      HashingEmbedder()))
    val composed = SemanticMaintenance.composeWithGen(spark, whDir).get._1
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val expect = graft.semantic.Semantic.buildSemantic(
        graft.fts.FtsIndex.buildFtss(g.triples, g.literals), HashingEmbedder())
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(composed === expect)
    assert(composed.contains(graft.functions.Hash64.hashString("<http://ex/d>")))
  }

  test("streamNt appends are seq-stamped: re-asserted quad outranks a delete") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val watch = s"$dir/watch"; val whDir = s"$dir/wh"; val ckpt = s"$dir/ckpt"
    new java.io.File(watch).mkdirs()
    val q = Streaming.streamNt(spark, watch, whDir, ckpt)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(watch, "batch1.nt"),
      "<http://ex/a> <http://ex/p> \"v1\" .\n")
    q.processAllAvailable()
    // delta rows carry a real seq column (uniform schema with insert())
    val delta = spark.read.parquet(s"$whDir/triples_delta")
    assert(delta.columns.contains("seq"),
      "streaming delta append must be seq-stamped")
    val wh = new graft.store.Warehouse(spark, whDir)
    // tombstone the streamed quad, then the STREAM re-asserts it — the
    // re-assert must carry a later seq than the tombstone and reappear
    assert(wh.delete(Seq(("<http://ex/a>", "<http://ex/p>", Some("\"v1\""), ""))).error.isEmpty)
    assert(wh.load().triples.count() === 0)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(watch, "batch2.nt"),
      "<http://ex/a> <http://ex/p> \"v1\" .\n")
    q.processAllAvailable()
    q.stop()
    assert(wh.load().triples.count() === 1,
      "stream-re-asserted quad must not stay tombstone-suppressed")
  }
}
