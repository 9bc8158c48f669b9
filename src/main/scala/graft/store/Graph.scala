package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Immutable handle on one dictionary-encoded RDF graph: the quad relation
  * plus its two term dictionaries (SURVEY §1.1; reference DDL at
  * /root/reference/src/bikidata/main.py:188-192).
  *
  * Schemas:
  *  - `triples(s, p, o, g: Long)` — every column a seed-0 XXH64 bit pattern
  *  - `iris(hash: Long, value: String)` — IRIs + blank nodes (+ the empty
  *    default-graph name)
  *  - `literals(hash: Long, value: String)` — N3 surface forms
  *
  * The unsigned u64 of the reference is stored as the same 64 bits in a
  * signed LongType; equality/join semantics are unaffected, and rendering
  * uses `java.lang.Long.toUnsignedString` at the edges.
  *
  * Scale notes: all engine joins hit these hash columns (16 B/row quads),
  * so shuffles stay narrow; `persist()` pins the hot tables for a serving
  * session, and dictionary joins are broadcast-eligible whenever the dict
  * fits `spark.sql.autoBroadcastJoinThreshold` (Catalyst/AQE decide).
  */
final case class Graph(
    spark: SparkSession,
    triples: DataFrame,
    iris: DataFrame,
    literals: DataFrame,
    // optional second copy of triples range-partitioned/sorted by `s`
    // (SURVEY §4.2): subject-bounded access (hydration, spo, sp) prunes
    // files/row groups by s min/max instead of scanning the whole
    // (p,o,s)-clustered relation — the difference between a point lookup
    // and a full pass at 100 TB. Identical rows; purely a layout copy.
    byS: Option[DataFrame] = None) {

  /** Combined decode dictionary. */
  def dict: DataFrame = iris.union(literals)

  /** Best source for s-equality/IN access paths. */
  def subjectAccess: DataFrame = byS.getOrElse(triples)

  /** Pin the relations that take FULL scans (triples for filters/facets,
    * dictionaries for decode). `byS` is deliberately NOT persisted: its
    * whole value is parquet row-group min/max pruning on s — point
    * probes touch a handful of row groups, so caching the second full
    * copy of triples would cost serving-session memory (competing with
    * the hot relations above) for accesses that already skip ~all I/O.
    * unpersist() still covers byS defensively for callers who persisted
    * it themselves.
    *
    * The pinned copies are RE-CLUSTERED to the session's parallelism
    * when the stored layout has fewer splits than cores: warehouse file
    * counts are sized for storage economics (~2M rows/file,
    * [[graft.ingest.Build.write]]), so a small store can be a single
    * file — and a cache partitioned like its source file would make
    * every downstream scan single-threaded for the whole serving
    * session. The one-time shuffle keeps the layout's clustering
    * ((p,o,s) for triples, value-range for the dictionaries), so
    * in-memory batch min/max pruning still works; at corpus scale file
    * partitions exceed cores and this is a no-op. Returns the Graph
    * holding the pinned frames — use the RETURNED value (the receiver's
    * frames stay unpersisted when re-clustering kicked in). */
  def persist(level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Graph = {
    val cores = spark.sparkContext.defaultParallelism
    def widened(df: DataFrame, recluster: DataFrame => DataFrame): DataFrame =
      if (df.rdd.getNumPartitions >= cores) df else recluster(df)
    import org.apache.spark.sql.functions.col
    val g = copy(
      triples = widened(triples,
        _.repartition(cores, col("p")).sortWithinPartitions("p", "o", "s")),
      iris = widened(iris,
        _.repartitionByRange(cores, col("value")).sortWithinPartitions("value")),
      literals = widened(literals,
        _.repartitionByRange(cores, col("value")).sortWithinPartitions("value")))
    g.triples.persist(level); g.iris.persist(level); g.literals.persist(level)
    g
  }

  def unpersist(): Graph = {
    triples.unpersist(); iris.unpersist(); literals.unpersist()
    byS.foreach(_.unpersist())
    this
  }

  /** Escape hatch (reference `raw()`, query.py:8-10): register the three
    * core tables as temp views for ad-hoc Spark SQL. */
  def registerViews(prefix: String = ""): Unit = {
    triples.createOrReplaceTempView(prefix + "triples")
    iris.createOrReplaceTempView(prefix + "iris")
    literals.createOrReplaceTempView(prefix + "literals")
  }
}
