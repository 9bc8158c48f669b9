package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budget-constrained corpus selection: keep the best-scoring documents
  * whose cumulative token mass fits a budget — the final "take the top
  * N tokens" step of a curation run, after scoring/filtering/dedup.
  *
  * Sharded like [[Packing]] (`id % shards`, budget split evenly): the
  * running sum is a per-shard window, so the plan never funnels the
  * corpus through one globally-sorted partition — the same contract
  * real pipelines use (greedy selection within shards approximates the
  * global greedy to within one document per shard). Selection is
  * deterministic on any cluster/partitioning: score desc with an id
  * tie-break, prefix-greedy (the running total is monotone, so the kept
  * set is a prefix of each shard's ranking).
  */
object Selection {

  /** Shards when the caller does not pass an explicit count: scales
    * with the input's partitioning so each shard's window sort stays
    * one-partition-sized at any corpus scale (a FIXED default would
    * mean a fixed number of globally-sorted partitions at 100 TB). The
    * floor keeps tiny inputs deterministic and parallel. */
  private def defaultShards(df: DataFrame): Int =
    math.max(8, df.rdd.getNumPartitions)

  def selectByBudget(df: DataFrame, idCol: String, scoreCol: String,
      tokensCol: String, budget: Long, shards: Int = 0): DataFrame = {
    require(shards >= 0, "shards must be non-negative")
    require(budget >= 1, s"budget ($budget) would select nothing")
    // the DERIVED default is clamped to the budget: a small budget over
    // a wide input must not throw (nor spread one token per shard) just
    // because the upstream partitioning is wide; an EXPLICIT shard count
    // keeps the strict contract below
    val nShards =
      if (shards == 0) math.min(defaultShards(df).toLong, budget).toInt
      else shards
    require(budget >= nShards,
      s"budget ($budget) below shards ($nShards) would select nothing")
    // working columns would silently shadow same-named input columns
    // (stratifiedSample guards its rank column the same way)
    for (c <- Seq("shard", "cum_tokens"))
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before selectByBudget")
    // distribute the remainder: the first (budget % nShards) shards get
    // one extra token, so the shard budgets SUM to the requested budget
    // instead of silently flooring away up to nShards−1 tokens
    val base = budget / nShards
    val rem = budget % nShards
    val shardBudget = when(col("shard") < rem, lit(base + 1)).otherwise(lit(base))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    // pmod, not %: negative ids under % would mint up to 2·shards−1
    // shard groups, each granted budget/shards — overshooting the total
    // budget (Packing uses pmod for the same reason)
    df.withColumn("shard", pmod(col(idCol), lit(nShards)).cast("long"))
      .withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= shardBudget)
  }
}
