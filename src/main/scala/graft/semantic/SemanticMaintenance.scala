package graft.semantic

import graft.store.StoreIO
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** O(delta) maintenance for the subject-embedding index across mutations.
  *
  * The reference rebuilds its semantic table from scratch after any data
  * change (semantic.py:41-87 re-embeds every 2-hop doc); at corpus scale
  * that is a full re-embed — by far the most expensive derived artifact
  * (network/GPU-bound) — triggered by a single point insert. Here a
  * mutation instead MARKS the affected subjects
  * (`semantic_stale`, [[markStale]]) and the next [[repair]] re-embeds
  * only those subjects' 2-hop docs, appending seq-versioned rows to
  * `literals_semantic_delta` (a null vec is a removal: the subject no
  * longer has a doc). [[compose]] resolves base ∪ delta by max seq per
  * subject — the serving frame is exactly what a full rebuild over the
  * mutated store would produce, for the cost of the delta.
  *
  * Affected set for a mutation touching subjects M (insert or delete):
  * M itself (their own literals / outgoing doc links changed) plus every
  * subject with an edge INTO M (their 2-hop doc concatenates M's 1-hop
  * doc — `FtsIndex.buildFtss` fts2). Parents are computed over base +
  * delta triples IGNORING tombstones — a superset of both the pre- and
  * post-mutation edge sets, so a parent whose doc LOST a contribution
  * through a deleted edge is re-embedded too. Over-marking only costs a
  * wasted re-embed, never correctness.
  *
  * Sequencing: stale rows carry the warehouse mutation counter
  * ([[graft.store.Warehouse.currentSeq]]); a repair stamps its delta rows
  * with the max stale seq it covers, so later repairs of a re-staled
  * subject strictly outrank earlier ones and the base (seq 0).
  * A crash between the delta append and the stale-list clear re-embeds
  * the same subjects next time — idempotent, the newer rows win ties
  * by being byte-identical (same doc, same embedder).
  */
object SemanticMaintenance {

  val SemDir = "literals_semantic"
  val DeltaDir = "literals_semantic_delta"
  val StaleDir = "semantic_stale"
  val AnnDir = "semantic_ann"

  /** All four on-disk artifacts, for wholesale invalidation. */
  val AllDirs: Seq[String] = Seq(SemDir, DeltaDir, StaleDir, AnnDir)

  /** Stale sets past this bound skip the restricted doc build (its
    * subject set is broadcast) and fall back to a full rebuild. */
  val MaxStaleForDeltaRepair = 2000000L

  /** Record the subjects whose 2-hop doc a mutation may have changed.
    * Returns false when there is no persisted semantic index to maintain
    * (the caller falls back to dropping, which is then a no-op). */
  def markStale(spark: SparkSession, warehouseDir: String,
      subjectHashes: Seq[Long], seq: Long): Boolean = {
    if (subjectHashes.isEmpty)
      return StoreIO.exists(spark, s"$warehouseDir/$SemDir")
    import spark.implicits._
    markStaleDf(spark, warehouseDir, subjectHashes.distinct.toDF("hash"), seq)
  }

  /** [[markStale]] with the subject set as a relation — the streaming
    * ingest's micro-batches mark without a driver collect. */
  def markStaleDf(spark: SparkSession, warehouseDir: String,
      subj: DataFrame, seq: Long): Boolean = {
    if (!StoreIO.exists(spark, s"$warehouseDir/$SemDir")) return false
    val edges = rawEdges(spark, warehouseDir)
    val stale = edges match {
      case Some(e) =>
        // parents ride a broadcast semi-probe of the mutation batch —
        // one delta-bounded scan, never a shuffle of the triples
        val parents = e.join(broadcast(subj.withColumnRenamed("hash", "m")),
            col("o") === col("m"), "left_semi")
          .select(col("s").as("hash")).distinct()
        subj.unionByName(parents).distinct()
      case None => subj
    }
    stale.withColumn("seq", lit(seq))
      .write.mode(SaveMode.Append).parquet(s"$warehouseDir/$StaleDir")
    true
  }

  /** Base + delta triples with tombstones deliberately ignored — the
    * edge superset [[markStale]]'s parent walk needs. */
  private def rawEdges(spark: SparkSession, warehouseDir: String): Option[DataFrame] = {
    val base = s"$warehouseDir/triples"
    val delta = s"$warehouseDir/triples_delta"
    val frames = Seq(base, delta).filter(StoreIO.exists(spark, _))
      .map(p => spark.read.parquet(p).select("s", "o"))
    frames.reduceOption(_ unionByName _)
  }

  /** Re-embed every currently-stale subject's 2-hop doc against the
    * composed (post-mutation) graph and append the results to the delta;
    * clears the stale list on success. No-op when nothing is stale.
    * Returns false when the stale set exceeded the delta-repair bound —
    * the caller should rebuild from scratch instead. */
  def repair(spark: SparkSession, warehouseDir: String,
      triples: DataFrame, literals: DataFrame, embedder: Embedder): Boolean = {
    val stalePath = s"$warehouseDir/$StaleDir"
    if (!StoreIO.exists(spark, stalePath)) return true
    // SNAPSHOT the stale dir's data files before reading, and clear only
    // that snapshot at the end: markStale runs under the facade's
    // mutation lock but repair does not, and the embed window in between
    // is long (network/GPU-bound by design). A whole-dir delete here
    // would drop any mark appended during that window — the index would
    // then serve those subjects' stale embeddings silently and forever.
    // Parquet appends only ever CREATE new part files, so marks landing
    // after the snapshot survive untouched for the next repair.
    def dataFiles(): Seq[String] = StoreIO.list(spark, stalePath)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"$stalePath/$n")
    val snapshot = dataFiles()
    if (snapshot.isEmpty) return true
    val stale = spark.read.parquet(snapshot: _*)
    val staleHashes = stale.select("hash").distinct().persist()
    try {
      val n = staleHashes.count()
      if (n == 0) { snapshot.foreach(StoreIO.delete(spark, _)); return true }
      if (n > MaxStaleForDeltaRepair) return false
      val maxSeq = stale.agg(max(col("seq"))).head().getLong(0)
      val docs = graft.fts.FtsIndex.buildFtssFor(
        triples, literals, staleHashes.withColumnRenamed("hash", "s"))
      val vecs = Semantic.buildSemantic(docs, embedder)
        .select(col("hash"), col("vec"))
      // a stale subject with no re-built doc lost its last 2-hop literal:
      // an explicit null-vec removal row outranks its base/older rows
      val removals = staleHashes.join(vecs, Seq("hash"), "left_anti")
        .select(col("hash"), lit(null).cast("array<float>").as("vec"))
      vecs.unionByName(removals)
        .withColumn("seq", lit(maxSeq))
        .write.mode(SaveMode.Append).parquet(s"$warehouseDir/$DeltaDir")
      snapshot.foreach(StoreIO.delete(spark, _))
      true
    } finally { staleHashes.unpersist(); () }
  }

  /** The serving frame (hash, vec) plus the delta generation (max delta
    * seq; 0 with no delta — the [[SemanticAnn]] `semGen` invariant).
    * Base rows are excluded per-hash by a broadcast anti-join against the
    * (delta-sized) superseded-hash set — the corpus-sized base never
    * shuffles. */
  def composeWithGen(spark: SparkSession, warehouseDir: String): Option[(DataFrame, Long)] = {
    recoverFold(spark, warehouseDir)
    val semPath = s"$warehouseDir/$SemDir"
    if (!StoreIO.exists(spark, semPath)) return None
    val base = spark.read.parquet(semPath).select("hash", "vec")
    val deltaPath = s"$warehouseDir/$DeltaDir"
    if (!StoreIO.exists(spark, deltaPath)) return Some((base, 0L))
    val delta = spark.read.parquet(deltaPath)
    val gen = delta.agg(max(col("seq"))).head().getLong(0)
    val latest = delta.groupBy("hash")
      .agg(max_by(col("vec"), col("seq")).as("vec"))
    val composed = base
      .join(broadcast(delta.select("hash").distinct()), Seq("hash"), "left_anti")
      .unionByName(latest.filter(col("vec").isNotNull))
    Some((composed, gen))
  }

  /** Delta rows strictly after `sinceGen` — the patch set for an ANN
    * whose `semGen` lags the composed frame. */
  def deltaSince(spark: SparkSession, warehouseDir: String, sinceGen: Long): DataFrame = {
    val delta = spark.read.parquet(s"$warehouseDir/$DeltaDir")
    delta.filter(col("seq") > sinceGen)
      .groupBy("hash").agg(max_by(col("vec"), col("seq")).as("vec"))
  }

  /** Offline fold (compact-time): rewrite the base as the composed frame
    * and drop the delta + ANN (the ANN's superseded cell rows and stale
    * radii reset with a rebuild over the folded base; `semGen` returns
    * to 0). The stale list — mutations not yet re-embedded — survives
    * the fold untouched. Crash contract: every window leaves a complete
    * copy of the composed data under SOME name — [[recoverFold]] (run
    * before any read or re-fold) rolls the one mid-swap window back; a
    * crash before the delta delete merely re-applies the (idempotent)
    * delta over the already-folded base. */
  def foldAtCompact(spark: SparkSession, warehouseDir: String): Unit = {
    recoverFold(spark, warehouseDir)
    // reclaim a corpus-sized _semantic_fold stranded by a crash between
    // its write and the swap (recoverFold only handles _semantic_old).
    // Deleted HERE — under the compact caller's single-writer lock — and
    // not in recoverFold, which composeWithGen also runs: a concurrent
    // reader must never delete a live compaction's half-written fold
    // (the rename could then publish a torn frame).
    StoreIO.delete(spark, s"$warehouseDir/_semantic_fold")
    if (!StoreIO.exists(spark, s"$warehouseDir/$DeltaDir")) return
    composeWithGen(spark, warehouseDir).foreach { case (composed, _) =>
      val tmp = s"$warehouseDir/_semantic_fold"
      val old = s"$warehouseDir/_semantic_old"
      composed.write.mode(SaveMode.Overwrite).parquet(tmp)
      // ann first: once the folded base is live, a pristine-looking ann
      // (semGen 0) over unfolded cells would serve superseded vectors
      StoreIO.delete(spark, s"$warehouseDir/$AnnDir")
      StoreIO.rename(spark, s"$warehouseDir/$SemDir", old)
      StoreIO.rename(spark, tmp, s"$warehouseDir/$SemDir")
      StoreIO.delete(spark, old)
      StoreIO.delete(spark, s"$warehouseDir/$DeltaDir")
    }
  }

  /** Roll back a [[foldAtCompact]] that crashed mid-swap: a live base
    * wins (the retired copy is garbage); a missing base restores the
    * retired copy so the pre-fold state — base + still-present delta —
    * serves unchanged. */
  def recoverFold(spark: SparkSession, warehouseDir: String): Unit = {
    val old = s"$warehouseDir/_semantic_old"
    if (!StoreIO.exists(spark, old)) return
    if (StoreIO.exists(spark, s"$warehouseDir/$SemDir")) StoreIO.delete(spark, old)
    else StoreIO.rename(spark, old, s"$warehouseDir/$SemDir")
  }
}
