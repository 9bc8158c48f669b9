package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixtures.
  *
  * Pre-training recipes DOWN-weight corpus slices ("domains")
  * differently — e.g. keep 30% of web, 80% of books — and the sample
  * must be REPRODUCIBLE: the same rows selected on every run, any
  * cluster, any partitioning. `rand()` cannot provide that (per-task
  * seeds move with the split layout), so the decision is a pure
  * function of the row key: a salted md5 bucket compared against the
  * domain's rate. Row-local, no shuffle; a 100 TB corpus maps straight
  * through the filter. Rates are keep-probabilities in [0, 1] —
  * UP-weighting (books 2×) is epoch repetition, [[epochRepeat]] (which
  * plans reader passes rather than duplicating storage). Rows with a
  * NULL key are dropped at any rate (no key, no reproducible decision).
  */
object Sampling {

  /** Uniform 32-bit bucket from a salted md5 of the key — the first 8
    * hex digits parsed as an integer. An engine-portable construction:
    * DuckDB computes the identical value as
    * `('0x' || substr(md5(key || ':' || salt), 1, 8))::UBIGINT`. */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 8),
      16, 10).cast("long")

  /** Keep each row with probability `rates(group)` (groups not listed
    * fall back to `defaultRate`), decided by [[hashBucket]] — i.e.
    * deterministic per-domain Bernoulli sampling. The rate is converted
    * to an integer threshold (`round(rate · 2³²)`) so the comparison
    * has no floating-point boundary ambiguity. Small rate maps compile
    * to a `when`-chain (codegen'd, no join); for hundreds of domains
    * broadcast-join a rates table instead. */
  def mixtureSample(df: DataFrame, keyCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "mix"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates are keep-probabilities in [0, 1]; up-weighting is epoch repetition")
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (g, r)) => when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt) <
      round(rateCol * lit(4294967296.0)).cast("long"))
  }

  /** Plan a training mixture under a token budget — the step between
    * per-domain token counts and [[mixtureSample]]/[[epochRepeat]]
    * (the UniMax recipe, Chung et al. 2023: allocate the budget by
    * temperature-scaled proportions, cap every domain at `maxEpochs`
    * passes over its data, and water-fill the remainder over the
    * uncapped domains). Returns tokens-to-draw per domain; divide by
    * the domain size to get the epoch count to feed [[epochRepeat]]
    * (values < 1 are [[mixtureSample]] rates).
    *
    * `alpha` is the usual temperature exponent on the size
    * distribution: 1.0 = proportional sampling, 0 = uniform across
    * domains, in between up-weights the tail. Driver-side pure math —
    * the inputs are one aggregate row per domain, never corpus-scale.
    * Deterministic: domains process in sorted-name order and the
    * water-filling loop is a pure function of (sizes, alpha, budget,
    * maxEpochs). */
  def planMixture(tokens: Map[String, Long], budget: Long,
      alpha: Double = 0.7, maxEpochs: Double = 4.0): Map[String, Double] = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    require(maxEpochs > 0.0, s"maxEpochs must be positive, got $maxEpochs")
    require(tokens.values.forall(_ > 0), "domain token counts must be positive")
    if (tokens.isEmpty) return Map.empty
    val names = tokens.keys.toSeq.sorted
    val w = names.map(n => n -> math.pow(tokens(n).toDouble, alpha)).toMap
    val cap = names.map(n => n -> maxEpochs * tokens(n)).toMap
    // water-fill: give each uncapped domain budget·w/Σw; domains that
    // would exceed their cap freeze at it and release the excess
    var alloc = names.map(n => n -> 0.0).toMap
    var remaining = math.min(budget.toDouble, cap.values.sum)
    var open = names
    while (remaining > 1e-9 && open.nonEmpty) {
      val wSum = open.map(w).sum
      val next = open.map(n => n -> math.min(cap(n) - alloc(n), remaining * w(n) / wSum))
      alloc = alloc ++ next.map { case (n, a) => n -> (alloc(n) + a) }
      remaining -= next.map(_._2).sum
      open = open.filter(n => cap(n) - alloc(n) > 1e-9)
    }
    alloc
  }

  /** Epoch repetition — the UP-weighting counterpart of
    * [[mixtureSample]]: a training mixture that over-samples a domain
    * (books 2.5×) reads it for 2 full epochs and Bernoulli-samples 50%
    * of it for a third. This operator emits that plan as rows: each
    * input row appears once per granted epoch with an `epoch` index
    * (0-based, contiguous), so `filter(epoch = i)` is exactly the i-th
    * reader pass and a trainer/writer can stream per-epoch slices
    * without ever materializing the duplication.
    *
    * Fractional epochs are decided per row by the same salted
    * [[hashBucket]] rule as [[mixtureSample]] — reproducible on any
    * cluster and any partitioning. Whole epochs are unconditional (no
    * key needed); a NULL key is never granted the fractional epoch
    * (no key, no reproducible decision), and a NULL group falls to
    * `defaultEpochs` (no group match). `epochs(group)` of 0 drops
    * the group. Row-local + a streamed `explode` — no shuffle; a
    * 100 TB corpus maps straight through. */
  def epochRepeat(df: DataFrame, keyCol: String, groupCol: String,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0,
      salt: String = "epoch", epochCol: String = "epoch"): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0.0 && e <= 1024.0),
      "epochs are repeat counts in [0, 1024] — a larger up-weight is a config bug")
    require(!df.columns.contains(epochCol),
      s"input already has a '$epochCol' column — pass a different epochCol")
    val eCol = epochs.toSeq.sortBy(_._1).foldLeft(lit(defaultEpochs)) {
      case (acc, (g, e)) => when(col(groupCol) === g, lit(e)).otherwise(acc)
    }
    // integer threshold, same construction as mixtureSample: no
    // floating-point boundary ambiguity, engine-portable (the gate's
    // DuckDB oracle recomputes it verbatim)
    val fracGranted = hashBucket(col(keyCol), salt) <
      round((eCol - floor(eCol)) * lit(4294967296.0)).cast("long")
    val reps = floor(eCol).cast("long") +
      when(fracGranted, 1L).otherwise(0L)
    df.withColumn("__reps", reps)
      .filter(col("__reps") >= 1)
      .withColumn(epochCol, explode(sequence(lit(0L), col("__reps") - 1)))
      .drop("__reps")
  }

  /** Deterministic GLOBAL sample of exactly min(k, n) rows: the k
    * smallest salted key-hashes (key tie-break) — a uniform without-
    * replacement draw, reproducible on any cluster/partitioning/engine,
    * that executes as a global top-k (TakeOrderedAndProject: per-
    * partition heaps + one bounded merge, never a full-sort
    * materialization — the exact-k counterpart of [[mixtureSample]]'s
    * rate-based thinning). Null keys are never drawn. */
  def sampleExact(df: DataFrame, keyCol: String, k: Int,
      salt: String = "sx"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.filter(col(keyCol).isNotNull)
      .orderBy(hashBucket(col(keyCol), salt).asc, col(keyCol).asc)
      .limit(k)
  }

  /** Deterministic weighted interleave — the training ORDER for a
    * multi-domain mixture ("examples-proportional mixing"): within each
    * shard, domain g's i-th row is scheduled at key i / weight(g), so
    * every prefix of the shard stream holds domains in proportion to
    * their weights (a domain with weight 3 appears 3× as often as a
    * weight-1 domain, evenly spread — not in runs). The input is a
    * sharded layout ([[graft.ops.Shards.trainingShuffle]] coordinates);
    * the output adds `ordCol`, the 1-based position in the shard's
    * reading order.
    *
    * Engine-exact: the schedule key is ONE IEEE double division
    * `rank / weight` (identical on any engine), ties across domains
    * break by (group, id). Two window exchanges — (shard, group) for
    * the domain rank, shard for the order — and nothing else; per-shard
    * windows keep every sort task shard-sized, never a global sorter
    * (the same contract as the layout itself). Weights must be
    * positive; groups not listed fall to `defaultWeight`. */
  def interleaveByWeight(df: DataFrame, idCol: String, groupCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      shardCol: String = "shard", posCol: String = "pos",
      ordCol: String = "ord"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ > 0.0),
      "interleave weights must be positive")
    require(!df.columns.contains(ordCol),
      s"input already has a '$ordCol' column — pass a different ordCol")
    require(!df.columns.contains("__key"),
      "input already has a '__key' column (reserved temp) — rename it first")
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (g, x)) => when(col(groupCol) === g, lit(x)).otherwise(acc)
    }
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol), col(groupCol))
      .orderBy(col(posCol).asc, col(idCol).asc)
    val ordW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol))
      .orderBy(col("__key").asc, col(groupCol).asc, col(idCol).asc)
    df.withColumn("__key",
        row_number().over(rankW).cast("double") / w)
      .withColumn(ordCol, row_number().over(ordW).cast("long"))
      .drop("__key")
  }

  /** Deterministic stratified sample: exactly min(k, |group|) rows per
    * group, chosen by ranking the salted [[hashBucket]] (key tie-break)
    * — i.e. a uniform without-replacement draw that is reproducible on
    * any cluster and any partitioning, unlike `df.stat.sampleBy` (seeded
    * per-task). One rank window per group; the heavy lifting is the
    * shuffle on `groupCol`, same cost class as any per-group top-k. For
    * extreme group skew, pre-filter with [[mixtureSample]] at a rate
    * ~k/|group| first so the window sees a bounded candidate set.
    * `rankCol` names the emitted rank column — pass an alternative if
    * the input already carries a `rank` (withColumn would overwrite
    * it silently). */
  def stratifiedSample(df: DataFrame, keyCol: String, groupCol: String,
      k: Int, salt: String = "strat", rankCol: String = "rank"): DataFrame = {
    require(!df.columns.contains(rankCol),
      s"input already has a '$rankCol' column — pass a different rankCol")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashBucket(col(keyCol), salt).asc, col(keyCol).asc)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
