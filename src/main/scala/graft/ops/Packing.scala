package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: concatenate documents in
  * order and split the token stream into fixed-`budget` sequences
  * ("concat-and-chunk", the standard GPT-style pre-training layout).
  *
  * The pack is computed per SHARD (`id % shards`): a single global
  * concatenation order would funnel the whole corpus through one
  * sorted window partition — the classic single-sorter bottleneck —
  * while real pipelines shard first and pack within shards, which is
  * embarrassingly parallel and reproducible. Within a shard the order
  * is ascending id, so the layout is deterministic end to end.
  *
  * Everything is integer arithmetic over one window cumsum plus a
  * `sequence` explode of the bins a document spans — no UDF, no
  * shuffle beyond the window's shard partitioning, exact under any
  * engine's arithmetic (oracle-checked in the gate).
  */
object Packing {

  final case class WholePack(shard: Long, bin: Long, id: Long, toks: Long)

  /** Resolve the shard count: explicit wins; `0` (the default) derives it
    * from `spark.sql.shuffle.partitions` — the knob that already sizes
    * every other shuffle for the deployment, so a 1000-executor cluster
    * packs through thousands of sorted partitions instead of funnelling
    * 100 TB through a hard-coded 8.
    *
    * THE DETERMINISM TRADE: the pack layout is a pure function of
    * (corpus, budget, SHARD COUNT) — two runs with different shuffle
    * settings produce different (equally valid) layouts. Pass `shards`
    * explicitly when the layout must be byte-reproducible across
    * deployments (the gate queries pin `shards = 8` for exactly this
    * reason); leave it 0 when throughput matters more than cross-config
    * reproducibility. */
  private def resolveShards(df: DataFrame, shards: Int): Int = {
    require(shards >= 0, s"shards must be >= 0 (0 = derive), got $shards")
    if (shards > 0) shards
    else df.sparkSession.sessionState.conf.numShufflePartitions
  }

  /** Next-fit packing that keeps documents WHOLE (the SFT-style layout —
    * a sample must not be split across sequences): walk each shard in id
    * order, open a new bin whenever the next document no longer fits.
    * A document longer than the budget gets a bin of its own. Runs as
    * one `mapPartitions` pass over shard-clustered, id-sorted rows —
    * per-partition imperative state is exactly what the next-fit
    * accumulator is, and the shard guarantees bounded, deterministic
    * per-task work. */
  def packWhole(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shards: Int = 0): DataFrame = {
    import df.sparkSession.implicits._
    val nShards = resolveShards(df, shards)
    df.select(col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("toks"),
        pmod(col(idCol), lit(nShards.toLong)).as("shard"))
      .filter(col("toks") > 0)
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        var curShard = -1L
        var bin = -1L
        var used = 0L
        rows.map { case (id, toks, shard) =>
          if (shard != curShard) { curShard = shard; bin = -1L; used = 0L }
          if (bin < 0 || used + toks > budget) { bin += 1; used = 0L }
          used += toks
          WholePack(shard, bin, id, toks)
        }
      }
      .toDF()
  }

  /** [[packChunks]] with the token counts computed from the TEXT itself
    * by the codegen BPE-ish tokenizer ([[TextAnalysis.bpeishTokenCount]])
    * instead of a caller-supplied count column — the layout then tracks
    * a trainer-style subword count rather than whatever estimate the
    * caller happened to precompute. Row-local (one expression inside the
    * scan projection), so the cost profile is identical to
    * [[packChunks]]: the shard window is still the only shuffle. */
  def packChunksByText(df: DataFrame, idCol: String, textCol: String,
      budget: Long, shards: Int = 0): DataFrame = {
    require(!df.columns.contains("__btoks"),
      "input already has a '__btoks' column — rename it before packChunksByText")
    packChunks(
      df.withColumn("__btoks", TextAnalysis.bpeishTokenCount(col(textCol))),
      idCol, "__btoks", budget, shards)
  }

  /** Padding-waste report for length-bucketed batching (the measurement
    * that justifies length-grouped batching in an SFT/encoder trainer):
    * each document pads to the ceiling of its length bucket, and the
    * report says how many pad tokens that costs per bucket. Buckets are
    * an EXPLICIT ascending boundary list compiled to a `when`-chain —
    * never `2^ceil(log2 n)`, whose float log at an exact power of two
    * rounds differently across engines; the chain is pure integer
    * comparison, bit-identical anywhere. Documents past the top
    * boundary clamp to it (the trainer's max sequence length truncates
    * them). Row-local bucket + ONE map-side-combined aggregate over
    * |boundaries| groups; `waste_e4` is the bucket's pad fraction in
    * 4-dp fixed point (one double division + round, identical on both
    * engines for positive values). Zero/negative-length docs drop. */
  def paddingReport(df: DataFrame, tokensCol: String,
      boundaries: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024, 2048)): DataFrame = {
    require(boundaries.nonEmpty && boundaries.head > 0,
      "boundaries must be positive")
    require(boundaries == boundaries.sorted && boundaries.distinct == boundaries,
      s"boundaries must be strictly ascending, got $boundaries")
    val cap = boundaries.last.toLong
    val t = least(col(tokensCol).cast("long"), lit(cap))
    val bucket = boundaries.init.reverse.foldLeft(lit(cap)) {
      case (acc, b) => when(t <= b, lit(b.toLong)).otherwise(acc)
    }
    df.filter(col(tokensCol).cast("long") > 0)
      .select(bucket.as("bucket"), t.as("__t"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).as("tok_sum"),
        sum(col("bucket") - col("__t")).as("pad_sum"))
      .withColumn("waste_e4",
        round(col("pad_sum") * 10000.0 / (col("bucket") * col("n_docs")))
          .cast("long"))
  }

  /** (shard, bin, id, tok_in_bin, tok_offset): which documents feed
    * which training sequence, how many of their tokens land there, and
    * where the slice starts inside the document. Zero-token documents
    * contribute nothing (same as concatenating an empty string). */
  def packChunks(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shards: Int = 0): DataFrame = {
    val nShards = resolveShards(df, shards)
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    df.select(col(idCol), col(tokensCol).cast("long").as("__toks"),
        pmod(col(idCol), lit(nShards.toLong)).as("shard"))
      .filter(col("__toks") > 0)
      .withColumn("cum_end", sum(col("__toks")).over(w))
      .withColumn("cum_start", col("cum_end") - col("__toks"))
      // the sequences this doc's token range [cum_start, cum_end)
      // overlaps: floor-div of the first and last token index
      .withColumn("bin",
        explode(sequence(expr(s"cum_start div $budget"),
          expr(s"(cum_end - 1) div $budget"))))
      .withColumn("tok_in_bin",
        least((col("bin") + 1) * budget, col("cum_end"))
          - greatest(col("bin") * budget, col("cum_start")))
      .withColumn("tok_offset",
        greatest(col("bin") * budget, col("cum_start")) - col("cum_start"))
      .select(col("shard"), col("bin"), col(idCol),
        col("tok_in_bin"), col("tok_offset"))
  }
}
