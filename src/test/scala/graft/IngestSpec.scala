package graft

import graft.ingest.Build
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** File-level ingest paths: plain .nt, gzipped .nt (transparent
  * decompression, main.py:76-80), and .trig with cross-line graph state
  * (parsed one-file-per-task). */
class IngestSpec extends SparkSpec {

  private val ntContent =
    """<http://ex/s1> <http://ex/p> "v1" .
      |<http://ex/s2> <http://ex/p> <http://ex/s1> .
      |not a triple
      |<http://ex/s3> <http://ex/p> "multi word value" .
      |""".stripMargin

  private val trigContent =
    """<http://ex/s0> <http://ex/p> "default graph" .
      |<http://ex/g1> {
      |<http://ex/s1> <http://ex/p> "in g1" .
      |}
      |<http://ex/g2> {
      |<http://ex/s2> <http://ex/p> "in g2" .
      |}
      |""".stripMargin

  test("plain and gzipped .nt parse identically") {
    val dir = Files.createTempDirectory("graft-ingest")
    Files.writeString(dir.resolve("data.nt"), ntContent)
    val gz = new GZIPOutputStream(Files.newOutputStream(dir.resolve("data.nt.gz")))
    gz.write(ntContent.getBytes("UTF-8")); gz.close()

    val plain = Build.quads(spark, Seq(dir.resolve("data.nt").toString)).collect().toSet
    val zipped = Build.quads(spark, Seq(dir.resolve("data.nt.gz").toString)).collect().toSet
    assert(plain === zipped)
    assert(plain.size === 3)
    assert(plain.exists(_.o == "\"multi word value\""))
  }

  test(".trig graph blocks survive the one-file-per-task path") {
    val dir = Files.createTempDirectory("graft-ingest")
    Files.writeString(dir.resolve("data.trig"), trigContent)
    val quads = Build.quads(spark, Seq(dir.resolve("data.trig").toString))
      .collect().sortBy(_.s)
    assert(quads.map(_.g).toSeq === Seq("", "<http://ex/g1>", "<http://ex/g2>"))
  }

  test("mixed .nt + .trig input unions both paths") {
    val dir = Files.createTempDirectory("graft-ingest")
    Files.writeString(dir.resolve("a.nt"), ntContent)
    Files.writeString(dir.resolve("b.trig"), trigContent)
    val graph = Build.graphFromFiles(spark,
      Seq(dir.resolve("a.nt").toString, dir.resolve("b.trig").toString))
    assert(graph.triples.count() === 6)
    // named graphs land in the iris dictionary; the empty default-graph
    // name does NOT (reference read_csv turns '' into NULL and drops it,
    // main.py:199-204 — quirk preserved)
    val iris = graph.iris.collect().map(_.getString(1)).toSet
    assert(iris.contains("<http://ex/g1>") && !iris.contains(""))
  }

  test("export round-trips the graph through TriG text") {
    import spark.implicits._
    val g0 = graft.ingest.Build.graphFromQuads(spark, Fixture.quads.toDF())
    val dir = Files.createTempDirectory("graft-export").toString + "/out"
    val n = graft.ingest.Export.nt(g0, dir)
    assert(n === Fixture.quads.size)
    // named graphs exist → single ordered file with TriG blocks
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".txt")).head
    val lines = Files.readAllLines(file.toPath)
    assert(lines.stream().anyMatch(_ == "<http://ex/graph1> {"))
    // default-graph triples come BEFORE any block (graph state never
    // resets in the reference's read_nt, so order is load-bearing)
    val openIdx = (0 until lines.size()).find(i => lines.get(i).endsWith(" {")).get
    assert((0 until openIdx).forall(i => !lines.get(i).endsWith(" {")))
    // re-ingest through the stateful TriG path: identical graph
    val trig = file.toPath.getParent.resolve("roundtrip.trig")
    Files.copy(file.toPath, trig)
    val g1 = graft.ingest.Build.graphFromFiles(spark, Seq(trig.toString))
    def tset(g: graft.store.Graph) =
      g.triples.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(tset(g1) === tset(g0))
    assert(g1.dict.collect().map(_.getString(1)).toSet ===
      g0.dict.collect().map(_.getString(1)).toSet)
  }

  test("export round-trip holds on random quad sets (fuzz)") {
    import spark.implicits._
    import graft.ingest.Quad
    val rnd = new scala.util.Random(11)
    val ps = (0 until 3).map(i => s"<urn:f:p$i>")
    val ss = (0 until 5).map(i => s"<urn:f:s$i>")
    val litWords = Vector("alpha", "beta gamma", "x.y", "étoile", "done .")
    def obj(): String =
      if (rnd.nextBoolean()) ss(rnd.nextInt(ss.length))
      else {
        val base = "\"" + litWords(rnd.nextInt(litWords.length)) + "\""
        rnd.nextInt(3) match {
          case 0 => base
          case 1 => base + "@en"
          case _ => base + "^^<urn:f:dt>"
        }
      }
    for (trial <- 1 to 3) {
      val gs = Seq("") ++ (0 until rnd.nextInt(3)).map(i => s"<urn:f:g$i>")
      val quads = (0 until (4 + rnd.nextInt(10))).map { _ =>
        Quad(ss(rnd.nextInt(ss.length)), ps(rnd.nextInt(ps.length)),
          obj(), gs(rnd.nextInt(gs.length)))
      }.distinct
      val g0 = graft.ingest.Build.graphFromQuads(spark, quads.toDF())
      val dir = Files.createTempDirectory(s"graft-exfuzz$trial").toString + "/out"
      graft.ingest.Export.nt(g0, dir, singleFile = true)
      val file = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".txt")).head
      val trig = file.toPath.getParent.resolve("rt.trig")
      Files.copy(file.toPath, trig)
      val g1 = graft.ingest.Build.graphFromFiles(spark, Seq(trig.toString))
      def tset(g: graft.store.Graph) = g.triples.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(tset(g1) === tset(g0),
        s"trial $trial: round-trip diverged for quads $quads")
    }
  }
}
