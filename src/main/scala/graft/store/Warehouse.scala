package graft.store

import graft.functions.Hash64
import graft.ingest.Quad
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Disk-backed graph with mutation support over immutable parquet
  * (SURVEY §2.1 insert/delete rows): the base datasets written by
  * [[graft.ingest.Build.write]] plus
  *
  *  - `triples_delta/` — appended insert parts,
  *  - `iris_delta/`, `literals_delta/` — appended dictionary parts,
  *  - `tombstones/` — exact (s,p,o,g) delete markers,
  *  - `tombstones_spg/` — o-wildcard (s,p,g) delete markers.
  *
  * `load()` composes base ∪ delta minus tombstones — O(1) mutations, no
  * rewrite of the base data; `compact()` folds everything back into a
  * fresh base. This is the standard delta/tombstone design for
  * append-only stores and scales to arbitrarily large bases (mutation
  * cost is proportional to the delta, not the base).
  */
final class Warehouse(val spark: SparkSession, val dir: String) {

  private def exists(sub: String): Boolean =
    new java.io.File(new java.io.File(dir), sub).exists()

  private def read(sub: String): Option[DataFrame] =
    if (exists(sub)) Some(spark.read.parquet(s"$dir/$sub")) else None

  private def readOrUnion(base: String, delta: String): DataFrame = {
    val parts = Seq(read(base), read(delta)).flatten
    require(parts.nonEmpty, s"warehouse $dir has no $base data")
    parts.reduce(_ union _)
  }

  def load(): Graph = {
    var triples = readOrUnion("triples", "triples_delta")
    read("tombstones").foreach(ts =>
      triples = triples.join(ts, Seq("s", "p", "o", "g"), "left_anti"))
    read("tombstones_spg").foreach(ts =>
      triples = triples.join(ts, Seq("s", "p", "g"), "left_anti"))
    val iris = readOrUnion("iris", "iris_delta")
      .groupBy("hash").agg(first("value").as("value"))
    val literals = readOrUnion("literals", "literals_delta")
      .groupBy("hash").agg(first("value").as("value"))
    Graph(spark, triples, iris, literals)
  }

  /** Validated point insert: appends delta parts (query.py:529-617
    * semantics — whole batch refused on invalid/duplicate). */
  def insert(quads: Seq[Quad]): MutationResult = {
    import spark.implicits._
    val graph = load()
    val (g2, res) = Mutations.insert(graph, quads)
    if (res.error.isDefined) return res
    quads.map(q => (Hash64.hashString(q.s), Hash64.hashString(q.p),
        Hash64.hashString(q.o), Hash64.hashString(q.g)))
      .toDF("s", "p", "o", "g")
      .write.mode(SaveMode.Append).parquet(s"$dir/triples_delta")
    // dictionary deltas were computed against the loaded graph
    val newIris = g2.iris.exceptAll(graph.iris)
    val newLits = g2.literals.exceptAll(graph.literals)
    if (res.irisInserted > 0)
      newIris.write.mode(SaveMode.Append).parquet(s"$dir/iris_delta")
    if (res.literalsInserted > 0)
      newLits.write.mode(SaveMode.Append).parquet(s"$dir/literals_delta")
    res
  }

  /** Validated delete: appends tombstones. */
  def delete(
      items: Seq[(String, String, Option[String], String)],
      areHashes: Boolean = false): MutationResult = {
    import spark.implicits._
    val graph = load()
    def toHash(v: String): Long =
      if (areHashes) java.lang.Long.parseUnsignedLong(v) else Hash64.hashString(v)
    if (!areHashes) {
      val missing = items.exists { case (s, p, o, g) =>
        graph.triples.filter(
          col("s") === toHash(s) && col("p") === toHash(p) && col("g") === toHash(g) &&
            (o match { case Some(ov) => col("o") === toHash(ov); case None => lit(true) })
        ).limit(1).count() == 0
      }
      if (missing) return MutationResult(error = Some("Triple does not exist, skipping delete"))
    }
    val exact = items.collect { case (s, p, Some(o), g) =>
      (toHash(s), toHash(p), toHash(o), toHash(g)) }
    val wild = items.collect { case (s, p, None, g) => (toHash(s), toHash(p), toHash(g)) }
    if (exact.nonEmpty)
      exact.toDF("s", "p", "o", "g").write.mode(SaveMode.Append).parquet(s"$dir/tombstones")
    if (wild.nonEmpty)
      wild.toDF("s", "p", "g").write.mode(SaveMode.Append).parquet(s"$dir/tombstones_spg")
    MutationResult(triplesDeleted = items.size)
  }

  /** Fold deltas + tombstones into a fresh base (run offline/periodic). */
  def compact(): Unit = {
    val g = load()
    val tmp = s"$dir/_compact"
    g.triples.repartition(col("p")).sortWithinPartitions("p", "o", "s")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/triples")
    g.iris.write.mode(SaveMode.Overwrite).parquet(s"$tmp/iris")
    g.literals.write.mode(SaveMode.Overwrite).parquet(s"$tmp/literals")
    import java.nio.file.{Files, Paths, StandardCopyOption}
    for (sub <- Seq("triples", "iris", "literals", "triples_delta", "iris_delta",
        "literals_delta", "tombstones", "tombstones_spg")) {
      val p = Paths.get(dir, sub)
      if (Files.exists(p)) {
        val del = new scala.reflect.io.Directory(new java.io.File(dir, sub))
        del.deleteRecursively()
      }
    }
    for (sub <- Seq("triples", "iris", "literals"))
      Files.move(Paths.get(tmp, sub), Paths.get(dir, sub), StandardCopyOption.ATOMIC_MOVE)
    Files.deleteIfExists(Paths.get(tmp))
  }
}
