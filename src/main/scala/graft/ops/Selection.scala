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

  def selectByBudget(df: DataFrame, idCol: String, scoreCol: String,
      tokensCol: String, budget: Long, shards: Int = 8): DataFrame = {
    require(shards > 0, "shards must be positive")
    require(budget >= shards,
      s"budget ($budget) below shards ($shards) would select nothing")
    val shardBudget = budget / shards
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    // pmod, not %: negative ids under % would mint up to 2·shards−1
    // shard groups, each granted budget/shards — overshooting the total
    // budget (Packing uses pmod for the same reason)
    df.withColumn("shard", pmod(col(idCol), lit(shards)).cast("long"))
      .withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= shardBudget)
  }
}
