package graft

import graft.api.Bikidata
import graft.ingest.Quad

/** End-to-end facade round trip on a disk warehouse, including the
  * persisted FTS index and its invalidation on mutation. */
class BikidataApiSpec extends SparkSpec {

  test("build → query → fts → mutate → delta-maintained index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-api").toString
    val nt = s"$dir/data.nt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nt),
      """<http://ex/a> <http://www.w3.org/2000/01/rdf-schema#label> "alpha thing" .
        |<http://ex/b> <http://www.w3.org/2000/01/rdf-schema#label> "beta thing" .
        |<http://ex/b> <http://ex/rel> <http://ex/a> .
        |""".stripMargin)
    val bk = new Bikidata(spark, s"$dir/wh")
    assert(bk.build(Seq(nt)) === 3)
    assert(bk.total() === 2)

    // fts query → index built AND persisted into the warehouse
    val r1 = bk.queryJson("""{"filters":[{"p":"fts","o":"alpha"}]}""")
    assert(r1.contains("<http://ex/a>"))
    assert(new java.io.File(s"$dir/wh/fts_meta.json").exists())

    // result cache: identical opts hit the cache (same string instance)
    val r2 = bk.queryJson("""{"filters":[{"p":"fts","o":"alpha"}]}""")
    assert(r1 eq r2)

    // insert invalidates the cache but KEEPS the stored index: the new
    // literal rides in as an O(delta) append (FtsIndex.appendDelta), not
    // a corpus rebuild — the base postings files must survive untouched
    def postingFiles(): Set[String] = {
      val d = new java.io.File(s"$dir/wh/fts_postings")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet
    }
    val baseFiles = postingFiles()
    assert(baseFiles.nonEmpty)
    val ins = bk.insert(Seq(Quad("<http://ex/c>",
      "<http://www.w3.org/2000/01/rdf-schema#label>", "\"gamma thing\"", "")))
    assert(ins.error.isEmpty)
    assert(new java.io.File(s"$dir/wh/fts_meta.json").exists(),
      "insert must not drop the literals fts index")
    assert(baseFiles.subsetOf(postingFiles()),
      "base postings must survive a mutation (delta append, not rebuild)")
    assert(postingFiles().size > baseFiles.size, "delta postings appended")

    // new literal findable through the delta-appended index
    val r3 = bk.queryJson("""{"filters":[{"p":"fts","o":"gamma"}]}""")
    assert(r3.contains("<http://ex/c>"))
    assert(bk.total() === 3)

    // old literals still findable alongside the delta
    assert(bk.queryJson("""{"filters":[{"p":"fts","o":"beta"}]}""")
      .contains("<http://ex/b>"))

    // delete with o wildcard
    val del = bk.delete(Seq(("<http://ex/c>",
      "<http://www.w3.org/2000/01/rdf-schema#label>", None, "")))
    assert(del.error.isEmpty)
    assert(bk.total() === 2)
  }

  test("a stored fts index out of sync with the dictionary is healed at ctx init") {
    val dir = java.nio.file.Files.createTempDirectory("graft-heal").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.nt"),
      """<http://ex/a> <http://www.w3.org/2000/01/rdf-schema#label> "alpha thing" .
        |<http://ex/b> <http://www.w3.org/2000/01/rdf-schema#label> "beta thing" .
        |""".stripMargin)
    val bk = new Bikidata(spark, s"$dir/wh")
    bk.build(Seq(s"$dir/data.nt"))
    assert(bk.queryJson("""{"filters":[{"p":"fts","o":"alpha"}]}""")
      .contains("<http://ex/a>"))
    // simulate the torn-append crash window: meta numDocs no longer
    // matches the dictionary (appendDelta never ran after an append)
    // tamper through StoreIO (Hadoop local FS keeps a CRC sidecar that a
    // raw java.nio write would invalidate)
    val metaPath = s"$dir/wh/fts_meta.json"
    val meta = graft.store.StoreIO.readString(spark, metaPath)
    graft.store.StoreIO.writeString(spark, metaPath,
      meta.replaceFirst("\"numDocs\":\\d+", "\"numDocs\":1"))
    // a fresh facade over the same warehouse detects the mismatch,
    // rebuilds, and serves exact results
    val bk2 = new Bikidata(spark, s"$dir/wh")
    assert(bk2.queryJson("""{"filters":[{"p":"fts","o":"beta"}]}""")
      .contains("<http://ex/b>"))
    val healed = graft.store.StoreIO.readString(spark, metaPath)
    assert(!healed.contains("\"numDocs\":1"), "meta must be rewritten by the rebuild")
  }

  test("buildFromQuads + async mutations round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bfq").toString
    val bk = new Bikidata(spark, s"$dir/wh")
    val quads = Seq(
      ("<http://ex/a>", "<http://www.w3.org/2000/01/rdf-schema#label>", "\"alpha\"", ""),
      ("<http://ex/b>", "<http://ex/rel>", "<http://ex/a>", "<http://ex/g1>"))
      .toDF("s", "p", "o", "g")
    assert(bk.buildFromQuads(quads) === 2)
    assert(bk.total() === 2)
    import scala.concurrent.Await
    import scala.concurrent.duration._
    val ins = Await.result(bk.insertAsync(Seq(Quad("<http://ex/c>",
      "<http://www.w3.org/2000/01/rdf-schema#label>", "\"gamma\"", ""))), 60.seconds)
    assert(ins.error.isEmpty && ins.triplesInserted === 1)
    val del = Await.result(bk.deleteAsync(Seq(("<http://ex/c>",
      "<http://www.w3.org/2000/01/rdf-schema#label>", None, ""))), 60.seconds)
    assert(del.error.isEmpty && del.triplesDeleted === 1)
    assert(bk.total() === 2)
  }

  test("result cache expires after the 7-day TTL (workers.py:104-107 parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ttl").toString
    val nt = s"$dir/data.nt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nt),
      "<http://ex/a> <http://www.w3.org/2000/01/rdf-schema#label> \"alpha\" .\n")
    var now = 1000L
    val bk = new Bikidata(spark, s"$dir/wh", clock = () => now)
    bk.build(Seq(nt))
    val opts = """{"filters":[{"p":"fts","o":"alpha"}]}"""
    val r1 = bk.queryJson(opts)
    // within the TTL: same cached instance
    now += Bikidata.DefaultCacheTtlMillis - 1
    assert(bk.queryJson(opts) eq r1)
    // at/past the TTL: entry evicted, result recomputed (equal, not same)
    now += 2
    val r3 = bk.queryJson(opts)
    assert(!(r3 eq r1) && r3 === r1)
    // useCache=false bypasses lookup AND store on the facade itself
    val r4 = bk.queryJson(opts, useCache = false)
    assert(!(r4 eq r3) && r4 === r3)
    // nondeterministic queries (random/sample) are never cached
    val rnd = """{"filters":[{"p":"id","o":"random 1"}]}"""
    assert(!(bk.queryJson(rnd) eq bk.queryJson(rnd)))
  }

  test("buildFtss persists the doc-table index (fts_main_fts parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ftss").toString
    val nt = s"$dir/data.nt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nt),
      """<http://ex/a> <http://www.w3.org/2000/01/rdf-schema#label> "alpha thing" .
        |<http://ex/b> <http://ex/rel> <http://ex/a> .
        |""".stripMargin)
    val bk = new Bikidata(spark, s"$dir/wh")
    bk.build(Seq(nt))
    bk.buildFtss()
    assert(new java.io.File(s"$dir/wh/ftss_meta.json").exists())
    // 2-hop doc of b contains a's label → searchable through the index
    val hits = bk.ftssIndex.matchBm25("alpha").collect().map(_.getLong(0)).toSet
    assert(hits.contains(graft.functions.Hash64.hashString("<http://ex/b>")))
    assert(hits.contains(graft.functions.Hash64.hashString("<http://ex/a>")))
  }
}
