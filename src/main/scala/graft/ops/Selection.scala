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

  /** Percentile-threshold curation: keep rows whose `scoreCol` is at
    * or above the corpus's DISCRETE q-quantile — "drop the bottom
    * decile by quality". The threshold is the smallest score value v
    * with `#{x <= v} >= ceil(q·n)`: an actual data value chosen by
    * pure integer rank counting, deliberately NOT the interpolated
    * (`quantile_cont`) quantile, whose lerp arithmetic differs in the
    * last ulp across engines and makes `>=` at a tied threshold
    * engine-dependent — rank counting is bit-free and any engine
    * replays it exactly (the gate's DuckDB oracle does, via a
    * cumulative-count window). `ceil(q·n)` is evaluated in double
    * arithmetic on both sides, so whatever the IEEE product rounds to,
    * both engines pick the same rank by construction.
    *
    * Cost: ONE map-side-combined `groupBy(score)` histogram collected
    * to the driver — bounded by the DISTINCT score count, not the
    * corpus (quality-style scores are rounded to a fixed grid, ≤ ~10⁴
    * values at 4 dp, at any corpus size), then a scalar filter. No
    * window over the corpus, no global sort, no TakeOrdered of q·n
    * rows through one partition. Null scores are never kept and don't
    * count toward n. */
  def keepAboveQuantile(df: DataFrame, scoreCol: String, q: Double): DataFrame = {
    require(q > 0.0 && q < 1.0, s"quantile must be in (0, 1), got $q")
    val hist = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("__s")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__s"))
      .collect()
    if (hist.isEmpty) return df.filter(lit(false))
    val n = hist.iterator.map(_.getLong(1)).sum
    val k = math.ceil(q * n).toLong
    var cum = 0L
    var th = hist.last.getDouble(0)
    var i = 0
    while (i < hist.length && cum < k) {
      th = hist(i).getDouble(0)
      cum += hist(i).getLong(1)
      i += 1
    }
    df.filter(col(scoreCol) >= th)
  }
}
