package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + sharding — the layout step between a
  * curated corpus and a trainer's data loader.
  *
  * Training wants the corpus in a pseudo-random order that is
  * REPRODUCIBLE (restartable jobs, audit trails) and produced with
  * BOUNDED memory. A true global `orderBy(rand())` is neither: the
  * order moves with the partitioning, and a single total sort of
  * 100 TB funnels through one range-partitioned sort pass whose output
  * order still has to be re-split into loader shards. The standard
  * layout instead assigns every row a salted-hash (shard, position):
  *
  *   shard = bucket(key, salt:shard) mod nShards
  *   pos   = rank of bucket(key, salt:pos) within the shard
  *
  * Both coordinates are pure functions of (key, salt, nShards) — the
  * same layout on any cluster, any partitioning, any run — and the
  * only data movement is ONE hash-partitioned exchange on `shard`
  * followed by a per-shard sort (Spark's external sort spills, so a
  * shard need not fit in memory). Size `nShards` so one shard ≈ one
  * comfortable output file (corpus_bytes / ~1 GB); at 1000 executors
  * that is thousands of independent sort tasks, no global barrier.
  *
  * Rows with a NULL key are dropped (no key, no reproducible
  * position — same rule as [[Sampling.mixtureSample]]).
  */
object Shards {

  /** Adds (`shardCol`, `posCol`) — the deterministic shuffle
    * coordinates described above. `posCol` is 1-based and dense within
    * each shard. Hash collisions between DISTINCT keys break by the
    * key itself, so the layout stays total; rows sharing the SAME key
    * value tie on both sort columns and take arbitrary adjacent
    * positions — `keyCol` must identify rows uniquely (dedup first,
    * or shuffle on a composite key) for the layout to be reproducible
    * row-for-row. */
  def trainingShuffle(df: DataFrame, keyCol: String, nShards: Int,
      salt: String = "shuf", shardCol: String = "shard",
      posCol: String = "pos"): DataFrame =
    withPos(withShard(df, keyCol, nShards, salt, shardCol, posCol),
      keyCol, salt, shardCol, posCol)

  /** The shard coordinate alone (null keys dropped). */
  private def withShard(df: DataFrame, keyCol: String, nShards: Int,
      salt: String, shardCol: String, posCol: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!df.columns.contains(shardCol) && !df.columns.contains(posCol),
      s"input already has a '$shardCol'/'$posCol' column — pass different names")
    df.filter(col(keyCol).isNotNull)
      .withColumn(shardCol,
        pmod(Sampling.hashBucket(col(keyCol), salt + ":shard"),
          lit(nShards.toLong)))
  }

  /** The position coordinate: rank within the shard. The window only
    * needs the input CLUSTERED by `shardCol` — any hash partitioning on
    * it satisfies the distribution, so a caller that pre-partitions
    * (see [[writeShards]]) pays no second exchange. */
  private def withPos(df: DataFrame, keyCol: String, salt: String,
      shardCol: String, posCol: String): DataFrame = {
    val w = Window.partitionBy(col(shardCol))
      .orderBy(Sampling.hashBucket(col(keyCol), salt + ":pos").asc,
        col(keyCol).asc)
    df.withColumn(posCol, row_number().over(w).cast("long"))
  }

  /** Materializes the shuffled layout: one parquet directory per shard
    * (`shard=N/`), rows stored in position order so a loader reading a
    * shard front-to-back replays the exact layout. The repartition runs
    * BEFORE the window: `repartition(nShards, shard)` clusters rows by
    * shard, the window's ClusteredDistribution is satisfied by it (no
    * second exchange — the window would otherwise re-shuffle to
    * `spark.sql.shuffle.partitions`, which generally differs from
    * nShards), and the window's own (shard, posHash, key) sort leaves
    * every partition already in position order when the files are cut.
    * ONE exchange total, pinned in PlanContractSpec. */
  def writeShards(df: DataFrame, keyCol: String, nShards: Int,
      path: String, salt: String = "shuf"): Unit =
    shardedForWrite(df, keyCol, nShards, salt)
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Per-shard manifest of a laid-out corpus: row count, byte volume,
    * max position (== `n_docs` iff the positions are dense — a free
    * layout-integrity invariant), and an ORDER-INVARIANT content
    * checksum: the exact decimal sum of a salted 32-bit hash of each
    * row's (key, text-md5). Addition commutes, so two manifests agree
    * iff the shards hold the same (key, content) multiset regardless of
    * row order, partitioning, cluster, or engine — the cheap audit for
    * a 100 TB layout job (re-manifesting is one map pass + ONE
    * shard-keyed map-side-combined aggregate; comparing manifests is
    * nShards rows). The sum is decimal(38,0): 32-bit summands overflow
    * a BIGINT past ~2³¹ rows per shard, and wrap order is engine-
    * defined — decimal keeps the value exact at any scale. Null text
    * contributes no bytes and no checksum term on either engine (SQL
    * sum-skips-null semantics, mirrored by the oracle). */
  def manifest(sharded: DataFrame, keyCol: String, textCol: String,
      shardCol: String = "shard", posCol: String = "pos",
      salt: String = "manifest"): DataFrame =
    sharded.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col(textCol)).cast("long")).as("bytes"),
        max(col(posCol)).as("max_pos"),
        sum(Sampling.hashBucket(
            concat(col(keyCol).cast("string"), lit("|"), md5(col(textCol))),
            salt).cast("decimal(38,0)")).as("checksum"))

  /** The frame [[writeShards]] materializes — exposed so the one-exchange
    * contract is pinnable without a filesystem write. */
  private[graft] def shardedForWrite(df: DataFrame, keyCol: String,
      nShards: Int, salt: String = "shuf"): DataFrame =
    withPos(
      withShard(df, keyCol, nShards, salt, "shard", "pos")
        .repartition(nShards, col("shard")),
      keyCol, salt, "shard", "pos")
}
