package graft

import graft.api.Bikidata
import graft.fts.FtsIndex
import graft.functions.Hash64
import graft.ingest.Quad
import graft.semantic.{HashingEmbedder, Semantic, SemanticMaintenance}
import graft.store.Warehouse

/** O(delta) semantic-index maintenance across mutations: repairs must
  * reproduce exactly what a full rebuild over the mutated store computes
  * (HashingEmbedder is token-multiset-based, so doc part ordering — the
  * one nondeterminism in the 2-hop doc build — cannot leak into vectors),
  * the ANN patch must stay lossless, and the compact-time fold must be
  * invisible to queries. */
class SemanticMaintenanceSpec extends SparkSpec {

  private val Label = "<http://www.w3.org/2000/01/rdf-schema#label>"
  private val Rel = "<http://ex/rel>"

  private def freshStore(): (String, Bikidata) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sem").toString
    val nt = s"$dir/data.nt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nt),
      s"""<http://ex/a> $Label "alpha ember" .
         |<http://ex/b> $Label "beta stone" .
         |<http://ex/c> $Label "gamma cloud" .
         |<http://ex/a> $Rel <http://ex/b> .
         |""".stripMargin)
    val bk = new Bikidata(spark, s"$dir/wh")
    bk.build(Seq(nt))
    bk.buildSemantic()
    (s"$dir/wh", bk)
  }

  /** What a from-scratch rebuild over the CURRENT composed store
    * computes — the exactness oracle for every repair. */
  private def fullRebuild(wh: String): Map[Long, Seq[Float]] = {
    val g = new Warehouse(spark, wh).load()
    Semantic.buildSemantic(FtsIndex.buildFtss(g.triples, g.literals), HashingEmbedder())
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
  }

  private def composed(wh: String): Map[Long, Seq[Float]] =
    SemanticMaintenance.composeWithGen(spark, wh).get._1
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

  test("insert repairs only the touched subjects and matches a full rebuild") {
    val (wh, bk) = freshStore()
    val before = composed(wh)
    assert(before.keySet ===
      Set("<http://ex/a>", "<http://ex/b>", "<http://ex/c>").map(Hash64.hashString))

    val r = bk.insert(Seq(Quad("<http://ex/b>", Label, "\"beta granite\"", "")))
    assert(r.error.isEmpty)
    // the mutation marked instead of dropping: base survives, stale recorded
    assert(new java.io.File(s"$wh/literals_semantic").exists())
    assert(new java.io.File(s"$wh/semantic_stale").exists())

    bk.buildSemantic() // repair
    // repair clears the stale marks it SNAPSHOTTED (file-level deletes,
    // so marks appended concurrently survive) — the dir husk may remain
    val staleLeft = Option(new java.io.File(s"$wh/semantic_stale").listFiles())
      .getOrElse(Array.empty)
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(staleLeft.isEmpty,
      s"stale data files survived repair: ${staleLeft.mkString(",")}")
    assert(new java.io.File(s"$wh/literals_semantic_delta").exists())
    val after = composed(wh)
    val expect = fullRebuild(wh)
    assert(after === expect)
    // b changed; a (parent via rel edge, 2-hop doc) changed; c untouched
    val hb = Hash64.hashString("<http://ex/b>")
    val ha = Hash64.hashString("<http://ex/a>")
    val hc = Hash64.hashString("<http://ex/c>")
    assert(after(hb) !== before(hb))
    assert(after(ha) !== before(ha))
    assert(after(hc) === before(hc))
  }

  test("deleting a subject's only literal removes it from the index") {
    val (wh, bk) = freshStore()
    val r = bk.delete(Seq(("<http://ex/c>", Label, Some("\"gamma cloud\""), "")))
    assert(r.error.isEmpty)
    bk.buildSemantic()
    val after = composed(wh)
    assert(after === fullRebuild(wh))
    assert(!after.contains(Hash64.hashString("<http://ex/c>")))
  }

  test("patched ANN stays lossless: semantic query == brute scan") {
    val (wh, bk) = freshStore()
    bk.insert(Seq(Quad("<http://ex/d>", Label, "\"delta ember glow\"", "")))
    bk.buildSemantic()
    val ctx = bk.ctx
    assert(ctx.semanticAnn.nonEmpty)
    assert(ctx.semanticAnn.get.semGen > 0)
    assert(ctx.semanticAnn.get.authoritative.nonEmpty)
    def subjects(c: graft.algebra.EngineContext): Set[String] = {
      val r = graft.algebra.QueryEngine.query(c,
        graft.algebra.QueryOpts(filters = Seq(
          graft.algebra.FilterQ(p = "semantic", o = "ember glow"))))
      r.results.keySet
    }
    val annRows = subjects(ctx)
    assert(annRows.nonEmpty)
    assert(annRows === subjects(ctx.copy(semanticAnn = None)))
  }

  test("repair is idempotent and a re-delivered stale batch is harmless") {
    val (wh, bk) = freshStore()
    bk.insert(Seq(Quad("<http://ex/b>", Label, "\"beta slate\"", "")))
    bk.buildSemantic()
    val once = composed(wh)
    // crash-retry simulation: the same subjects marked again at a later
    // seq, repaired again — the newer rows win and nothing duplicates
    val wh2 = new Warehouse(spark, wh)
    assert(SemanticMaintenance.markStale(spark, wh,
      Seq(Hash64.hashString("<http://ex/b>")), wh2.nextMutationSeq()))
    val g = wh2.load()
    assert(SemanticMaintenance.repair(spark, wh, g.triples, g.literals, HashingEmbedder()))
    val twice = composed(wh)
    assert(twice === once)
    assert(twice === fullRebuild(wh))
  }

  test("compact folds the delta into the base without changing results") {
    val (wh, bk) = freshStore()
    bk.insert(Seq(Quad("<http://ex/b>", Label, "\"beta quartz\"", "")))
    bk.buildSemantic()
    val before = composed(wh)
    new Warehouse(spark, wh).compact()
    assert(!new java.io.File(s"$wh/literals_semantic_delta").exists())
    assert(!new java.io.File(s"$wh/semantic_ann").exists())
    val (sem, gen) = SemanticMaintenance.composeWithGen(spark, wh).get
    assert(gen === 0L)
    assert(sem.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap === before)
  }

  test("mutation seq stays monotonic across compact: post-compact delete wins") {
    val (wh, bk) = freshStore()
    // two mutations push the counter up; the stale list (not yet
    // repaired) survives the compact with those seqs
    assert(bk.insert(Seq(Quad("<http://ex/b>", Label, "\"beta slate\"", ""))).error.isEmpty)
    assert(bk.insert(Seq(Quad("<http://ex/b>", Label, "\"beta granite\"", ""))).error.isEmpty)
    new Warehouse(spark, wh).compact()
    bk.buildSemantic() // repair stamps delta rows with the pre-compact max seq
    // a counter RESET by compact would mint this delete a LOWER seq than
    // the repair's rows — the old embedding would outrank the removal
    // forever; the preserved counter keeps it strictly above
    val r = bk.delete(Seq(
      ("<http://ex/b>", Label, Some("\"beta stone\""), ""),
      ("<http://ex/b>", Label, Some("\"beta slate\""), ""),
      ("<http://ex/b>", Label, Some("\"beta granite\""), "")))
    assert(r.error.isEmpty)
    bk.buildSemantic()
    val after = composed(wh)
    assert(after === fullRebuild(wh))
    assert(!after.contains(Hash64.hashString("<http://ex/b>")))
  }

  test("randomized mutation sequences: repair always equals a full rebuild") {
    // seeded random walk over inserts/deletes with repairs at random
    // points — the property the whole design rests on. Literal values
    // embed their subject so no two subjects ever share a 1-hop doc
    // (doc-string ordering between runs can then never change dedup
    // behavior; the embedder itself is token-multiset-invariant).
    val rnd = new scala.util.Random(42)
    val dir = java.nio.file.Files.createTempDirectory("graft-sem-prop").toString
    val subjects = (0 until 8).map(i => s"<http://ex/s$i>")
    val nt = s"$dir/seed.nt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nt),
      subjects.take(4).zipWithIndex.map { case (s, i) =>
        s"""$s $Label "seed label $i" .""" }.mkString("", "\n", "\n") +
        s"${subjects(0)} $Rel ${subjects(1)} .\n")
    val bk = new Bikidata(spark, s"$dir/wh")
    bk.build(Seq(nt))
    bk.buildSemantic()
    val live = scala.collection.mutable.Set.empty[(String, String, String)]
    subjects.take(4).zipWithIndex.foreach { case (s, i) =>
      live += ((s, Label, s""""seed label $i"""")) }
    live += ((subjects(0), Rel, subjects(1)))
    var nextVal = 0
    for (step <- 1 to 12) {
      val doInsert = live.isEmpty || rnd.nextBoolean()
      if (doInsert) {
        val s = subjects(rnd.nextInt(subjects.length))
        val (p, o) =
          if (rnd.nextInt(4) == 0) (Rel, subjects(rnd.nextInt(subjects.length)))
          else { nextVal += 1; (Label, s""""${s.drop(1).dropRight(1)} v$nextVal"""") }
        if (!live((s, p, o))) {
          assert(bk.insert(Seq(Quad(s, p, o, ""))).error.isEmpty, s"step $step insert")
          live += ((s, p, o))
        }
      } else {
        val victim = live.toSeq(rnd.nextInt(live.size))
        assert(bk.delete(Seq((victim._1, victim._2, Some(victim._3), ""))).error.isEmpty,
          s"step $step delete")
        live -= victim
      }
      if (rnd.nextInt(3) == 0 || step == 12) {
        bk.buildSemantic() // repair
        assert(composed(s"$dir/wh") === fullRebuild(s"$dir/wh"),
          s"repair diverged from full rebuild at step $step")
      }
    }
  }

  test("markStale without a persisted index reports false (caller drops)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sem-none").toString
    assert(!SemanticMaintenance.markStale(spark, dir, Seq(1L), 2L))
  }

  test("a mark appended during the embed window survives repair's stale clear") {
    // repair snapshots the stale dir's FILES at entry and deletes only
    // that snapshot: a mutation marking subjects while the (long,
    // network-bound by design) embed runs must not lose its marks to a
    // whole-dir delete — they wait for the next repair
    val (wh, bk) = freshStore()
    assert(bk.insert(Seq(
      Quad("<http://ex/c>", Label, "\"gamma basalt\"", ""))).error.isEmpty)
    val g = new Warehouse(spark, wh).load()
    GatingEmbedderState.reset()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = Future(SemanticMaintenance.repair(
      spark, wh, g.triples, g.literals, new GatingEmbedder))
    assert(GatingEmbedderState.started.await(
      60, java.util.concurrent.TimeUnit.SECONDS), "embed never started")
    // the concurrent mark, landing inside repair's embed window
    val hNew = Hash64.hashString("<http://ex/a>")
    assert(SemanticMaintenance.markStale(spark, wh, Seq(hNew), 99L))
    GatingEmbedderState.release.countDown()
    assert(Await.result(fut, scala.concurrent.duration.Duration(120, "s")))
    // only repair's snapshot was cleared — the mid-window mark survives
    val left = spark.read.parquet(s"$wh/semantic_stale")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(left.map(_._1).contains(hNew), s"concurrent mark lost: $left")
    assert(left.forall(_._2 == 99L), s"pre-snapshot marks resurfaced: $left")
  }
}

/** Latches for [[GatingEmbedder]] — a top-level object so the executor-
  * side closure references the module, not a serialized latch. */
object GatingEmbedderState {
  @volatile var started: java.util.concurrent.CountDownLatch = _
  @volatile var release: java.util.concurrent.CountDownLatch = _
  def reset(): Unit = {
    started = new java.util.concurrent.CountDownLatch(1)
    release = new java.util.concurrent.CountDownLatch(1)
  }
}

/** [[graft.semantic.HashingEmbedder]] that signals its first batch and
  * blocks until released — deterministically holds repair open inside
  * its embed window (local mode: executors share the JVM). */
class GatingEmbedder extends graft.semantic.Embedder {
  private val inner = HashingEmbedder()
  override def batchSize: Int = inner.batchSize
  override def dim: Int = inner.dim
  def embed(texts: Seq[String]): Seq[Array[Float]] = {
    GatingEmbedderState.started.countDown()
    GatingEmbedderState.release.await(
      120, java.util.concurrent.TimeUnit.SECONDS)
    inner.embed(texts)
  }
}
