package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** CCNet-style per-group score bucketing (Wenzek et al. 2020,
    * arXiv:1911.00359): within each group (per language, in the CCNet
    * recipe) rank rows by `scoreCol` ascending — lower LM surprisal =
    * cleaner text — and label the first `ceil(n/3)` rows `head`, rows
    * through `ceil(2n/3)` `middle`, the rest `tail`. Downstream recipes
    * train on head+middle or re-weight by bucket.
    *
    * Engine-exact by construction: the rank orders by the raw score
    * with an id tie-break, and both cut ranks are `ceil` of the SAME
    * IEEE double products (`n/3.0`, `n·2.0/3.0`) any engine computes
    * identically. ONE shuffle on `groupCol` for the two windows (rank +
    * group count share the partitioning); group sizes are per-language
    * corpus slices, so a task sorts one language's rows — for a
    * mega-language at 100 TB, pre-split the group key (lang, shard) and
    * accept per-shard tertiles, the same trade CCNet's per-shard
    * processing makes. */
  def scoreBuckets(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, bucketCol: String = "bucket"): DataFrame = {
    require(!df.columns.contains(bucketCol),
      s"input already has a '$bucketCol' column — pass a different bucketCol")
    for (c <- Seq("__rn", "__gn"))
      require(!df.columns.contains(c),
        s"input already has a '$c' column (reserved temp) — rename it first")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    val cw = Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__gn", count(lit(1)).over(cw))
      .withColumn(bucketCol,
        when(col("__rn") <= ceil(col("__gn") / lit(3.0)).cast("long"), lit("head"))
          .when(col("__rn") <= ceil(col("__gn") * lit(2.0) / lit(3.0)).cast("long"),
            lit("middle"))
          .otherwise(lit("tail")))
      .drop("__rn", "__gn")
  }

  /** Decile table of a GRID-VALUED score column — the distribution
    * summary a curation run reports ("quality deciles before/after the
    * cut"): for every d in 1..10, the rank-counted threshold (the
    * smallest data value v with #{x ≤ v} ≥ ceil(d·n/10)) and the exact
    * count at-or-below it. Same discrete rank rule as
    * [[keepAboveQuantile]] — an actual data value, never an
    * interpolated quantile whose lerp differs across engines.
    *
    * Cost: ONE map-side-combined `groupBy(score)` histogram; the
    * cumulative walk is a window over the HISTOGRAM frame, whose size
    * the grid contract bounds (4-dp scores → ≤ ~10⁴ rows in one sort
    * task at any corpus size — for a CONTINUOUS score, bucket it to a
    * grid first or use [[keepAboveQuantile]]'s refinement for a single
    * cut); the decile pick is a row-local explode of each histogram
    * row's matching deciles (no join, no broadcast build job).
    * Null/NaN scores are excluded (no engine-portable rank). */
  def scoreDeciles(df: DataFrame, scoreCol: String): DataFrame = {
    val s = col(scoreCol).cast("double")
    val hist = df.filter(col(scoreCol).isNotNull && !isnan(s))
      .groupBy(s.as("score")).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("score").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val h = hist.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    // each histogram row resolves its deciles ROW-LOCALLY: decile d's
    // cut rank k = ceil(d*n/10) lands on this row iff cum-c < k <= cum,
    // so explode the (<=10) matching deciles per row instead of joining
    // a broadcast 10-row frame - identical (row, decile) pairs, one job
    // instead of two (the broadcast build was its own Spark job), no
    // BroadcastNestedLoopJoin. Arithmetic unchanged: (d*n) cast to
    // double, /10.0, ceil, cast long.
    val k = (d: Column) => ceil((d * col("n")).cast("double") / lit(10.0))
      .cast("long")
    h.select(col("score"), col("c"), col("cum"),
        explode(filter(sequence(lit(1L), lit(10L)),
          d => col("cum") - col("c") < k(d) && col("cum") >= k(d))).as("decile"))
      .select(col("decile"), col("score").as("threshold"),
        col("cum").as("n_at_or_below"))
  }

  /** Per-group z-score outlier flags — the quality-anomaly pass that
    * surfaces documents wildly off their domain's distribution (a spam
    * burst inside a good domain, a template page inside a prose one).
    * `scoreE4Col` must be a 4-dp FIXED-POINT integer score (the repo's
    * standard grid, e.g. `round(quality·10⁴)`): the group moments
    * (n, Σq, Σq²) are then EXACT integer aggregates — order-invariant
    * at 1000 executors — and the z computation is one fixed chain of
    * IEEE double ops (mean = Σq/n; var = (Σq² − Σq·mean)/(n−1);
    * z = (q − mean)/√var) that any engine evaluates bit-identically,
    * emitted as `z_e2` (2-dp fixed point) with `outlier` =
    * |z_e2| ≥ 100·k. Groups of one row (or zero variance) have no
    * distribution to deviate from — z is 0, never flagged. ONE group
    * window exchange (the three moment windows share it); Σq² of a
    * 4-dp grid fits a long through ~10¹⁰ rows per group — past that,
    * swap the moment sums to decimal(38,0). */
  def zScoreFlags(df: DataFrame, groupCol: String, scoreE4Col: String,
      k: Double = 2.5, zCol: String = "z_e2",
      flagCol: String = "outlier"): DataFrame = {
    require(k > 0.0, s"k must be positive, got $k")
    for (c <- Seq(zCol, flagCol))
      require(!df.columns.contains(c),
        s"input already has a '$c' column — pass a different name")
    val w = Window.partitionBy(col(groupCol))
    val q = col(scoreE4Col).cast("long")
    val n = count(lit(1)).over(w)
    val s = sum(q).over(w)
    val ss = sum(q * q).over(w)
    val mean = s.cast("double") / n.cast("double")
    val varr = (ss.cast("double") - s.cast("double") * mean) /
      (n.cast("double") - lit(1.0))
    val z = (q.cast("double") - mean) / sqrt(varr)
    df.withColumn(zCol,
        when(n === 1 || varr <= 0.0, lit(0L))
          .otherwise(round(z * 100).cast("long")))
      .withColumn(flagCol,
        (abs(col(zCol)).cast("double") >= lit(100.0 * k)).cast("int"))
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
    * Cost on grid-valued scores (the quality-score case — rounded to a
    * fixed grid, ≤ ~10⁴ distinct values at 4 dp at any corpus size):
    * ONE map-side-combined `groupBy(score)` histogram, collected to the
    * driver through a `limit(maxDistinct + 1)` PROBE — a result within
    * the cap is provably the complete histogram and the threshold scan
    * finishes on the driver. A CONTINUOUS score column (surprisal,
    * model loss) blows past the cap; instead of an unbounded collect
    * the threshold then comes from [[rankThreshold]] — an exact
    * distributed range-refinement selection whose every driver round
    * is capped. No window over the corpus, no global sort, no
    * TakeOrdered of q·n rows through one partition on either path.
    * Null and NaN scores are never kept and don't count toward n (NaN
    * has no rank — Spark and DuckDB order it differently, so counting
    * it would make the threshold engine-dependent). */
  def keepAboveQuantile(df: DataFrame, scoreCol: String, q: Double,
      maxDistinct: Int = 65536): DataFrame = {
    require(q > 0.0 && q < 1.0, s"quantile must be in (0, 1), got $q")
    require(maxDistinct >= 2, s"maxDistinct must be >= 2, got $maxDistinct")
    val s = col(scoreCol).cast("double")
    val nn = df.filter(col(scoreCol).isNotNull && !isnan(s))
    val hist = nn
      .groupBy(s.as("__s")).agg(count(lit(1)).as("__c"))
      .limit(maxDistinct + 1)
      .collect()
    if (hist.isEmpty) return df.filter(lit(false))
    val th =
      if (hist.length <= maxDistinct) {
        // the probe came back whole: complete histogram, driver scan
        val sorted = hist.iterator
          .map(r => (r.getDouble(0), r.getLong(1))).toArray.sortBy(_._1)
        val n = sorted.iterator.map(_._2).sum
        scanThreshold(sorted, startCum = 0L, k = math.ceil(q * n).toLong)
      } else rankThreshold(nn, s, q, maxDistinct)
    df.filter(s >= th)
  }

  /** Smallest v in the ascending (value, count) run with
    * `startCum + Σcount(≤ v) >= k` — the rank-counting threshold rule,
    * shared by the driver-histogram path and the refinement rounds. */
  private def scanThreshold(sorted: Array[(Double, Long)], startCum: Long,
      k: Long): Double = {
    var cum = startCum
    var i = 0
    while (i < sorted.length - 1 && cum + sorted(i)._2 < k) {
      cum += sorted(i)._2
      i += 1
    }
    sorted(i)._1
  }

  /** Exact distributed rank selection for a score column with more
    * distinct values than the driver cap: iteratively narrow the value
    * range holding rank k. Each round first PROBES the exact per-score
    * histogram inside the current range (`limit(cap+1)` — if it fits,
    * the scan finishes on the driver); past the cap it buckets the
    * range uniformly, collects ≤ 4096 bucket counts, and descends into
    * the bucket containing the rank, using the bucket's observed
    * min/max as the next range so every round shrinks the value span
    * ≥ ~4096×. Doubles exhaust in well under 64 rounds (the full
    * double range is ~10⁶¹⁷ wide in ratio; 4096⁶⁴ ≈ 10²³¹ per the
    * subnormal tail twice over), so the loop is bounded; each round is
    * two corpus-filter jobs with bounded collects — the 100 TB story
    * is O(rounds) scans, never a corpus-sized driver transfer. */
  private def rankThreshold(nn: DataFrame, s: Column, q: Double,
      cap: Int): Double = {
    val first = nn.agg(min(s).as("mn"), max(s).as("mx"),
      count(lit(1)).as("n")).head()
    val k = math.ceil(q * first.getLong(2)).toLong
    var lo = first.getDouble(0)
    var hi = first.getDouble(1)
    var below = 0L // #{x < lo}, carried across rounds
    val B = 4096
    var round = 0
    while (lo < hi && round < 64) {
      val inRange = nn.filter(s >= lo && s <= hi)
      val hist = inRange.groupBy(s.as("__s")).agg(count(lit(1)).as("__c"))
        .limit(cap + 1).collect()
      if (hist.length <= cap) {
        val sorted = hist.iterator
          .map(r => (r.getDouble(0), r.getLong(1))).toArray.sortBy(_._1)
        return scanThreshold(sorted, below, k)
      }
      // MIN_VALUE floor: a subnormal-thin range can underflow the bucket
      // width to 0; the floor keeps the arithmetic finite and the probe
      // above catches such ranges (they hold only a handful of doubles)
      val w = math.max((hi - lo) / B, java.lang.Double.MIN_VALUE)
      val bucket = least(lit(B - 1), floor((s - lit(lo)) / lit(w)))
        .cast("int").as("__b")
      val buckets = inRange.groupBy(bucket)
        .agg(count(lit(1)).as("__c"), min(s).as("__mn"), max(s).as("__mx"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .sortBy(_._1)
      var cum = below
      var i = 0
      while (i < buckets.length - 1 && cum + buckets(i)._2 < k) {
        cum += buckets(i)._2
        i += 1
      }
      below = cum
      lo = buckets(i)._3
      hi = buckets(i)._4
      round += 1
    }
    require(round < 64, "rank refinement failed to converge") // unreachable
    lo
  }
}
