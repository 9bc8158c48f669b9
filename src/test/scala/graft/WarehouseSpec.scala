package graft

import graft.ingest.{Build, Quad}
import graft.store.Warehouse
import org.apache.spark.sql.functions._

/** Disk-backed warehouse round trip: build → load → insert (delta) →
  * delete (tombstone) → compact. */
class WarehouseSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-wh").toString + "/wh"

  test("build/write/load round-trips the graph; deltas and tombstones compose") {
    import spark.implicits._
    val dir = freshDir()
    val g0 = Build.graphFromQuads(spark, Fixture.quads.toDF())
    Build.write(g0, dir)
    val wh = new Warehouse(spark, dir)
    val loaded = wh.load()
    assert(loaded.triples.count() === Fixture.quads.size)

    // insert via delta part
    val r1 = wh.insert(Seq(Quad("<http://ex/han>", Fixture.label, "\"Han Solo\"", "")))
    assert(r1.error.isEmpty && r1.triplesInserted === 1)
    assert(wh.load().triples.count() === Fixture.quads.size + 1)
    // duplicate insert refused against the composed view (base ∪ delta)
    val r2 = wh.insert(Seq(Quad("<http://ex/han>", Fixture.label, "\"Han Solo\"", "")))
    assert(r2.error.contains("Triple already exists, skipping insert"))

    // delete via tombstone (o wildcard)
    val r3 = wh.delete(Seq(("<http://ex/han>", Fixture.label, None, "")))
    assert(r3.error.isEmpty)
    assert(wh.load().triples.count() === Fixture.quads.size)
    // the deleted subject no longer decodes from triples
    val h = graft.functions.Hash64.hashString("<http://ex/han>")
    assert(wh.load().triples.filter(col("s") === h).count() === 0)

    // compact folds everything into a fresh base
    wh.compact()
    val compacted = wh.load()
    assert(compacted.triples.count() === Fixture.quads.size)
    assert(compacted.triples.filter(col("s") === h).count() === 0)
    assert(!new java.io.File(dir, "triples_delta").exists())
  }

  test("warehouse parquet layout clusters by predicate for row-group skipping") {
    import spark.implicits._
    val dir = freshDir()
    Build.write(Build.graphFromQuads(spark, Fixture.quads.toDF()), dir)
    // a p = h filter over the sorted layout must reach the parquet scan
    val plan = spark.read.parquet(s"$dir/triples")
      .filter(col("p") === graft.functions.Hash64.hashString(Fixture.label))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(p), EqualTo(p,"),
      s"predicate not pushed to parquet scan:\n$plan")
  }
}
