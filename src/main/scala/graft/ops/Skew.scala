package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation for wide aggregates: two-stage SALTED
  * aggregation — `groupBy(key, salt)` partial, then `groupBy(key)`
  * final over the bucket partials.
  *
  * Catalyst's map-side partial aggregation already absorbs most skew
  * for algebraic aggregates, and AQE re-splits skewed JOIN partitions —
  * but neither helps when a reduce-side hot KEY's combined state still
  * lands in one task: a domain holding half the crawl, a null-ish
  * sentinel key, a header-row value. The salt splits that key's rows
  * across `buckets` reduce tasks, each aggregating a slice, and the
  * (key-cardinality × buckets)-sized partial table — tiny next to the
  * corpus — folds in a second exchange. Cost: one extra shuffle of the
  * PARTIAL table, never the corpus; the win: the hottest task shrinks
  * by ~`buckets`×.
  *
  * The salt is the hash of a caller-named row-unique column, NOT
  * `rand()`/`monotonically_increasing_id()` (task-seeded — the layout
  * would change with partitioning and break retries); results are
  * therefore bit-identical to the unsalted aggregate on any cluster,
  * which is exactly what the gate's oracle (a plain GROUP BY) checks.
  * Only ASSOCIATIVE, bucket-decomposable aggregates belong here —
  * count and exact integer sums are provided; a mean is sum/count at
  * read time; a median is NOT decomposable this way (use the rank
  * histogram in [[Selection]]). */
object Skew {

  /** Per-key row count and exact integer sums of `sumCols`, computed
    * through `buckets` salted partials. Output: key, `n`, one `sum_<c>`
    * per sum column — identical values to the direct aggregate. */
  def saltedAgg(df: DataFrame, keyCol: String, idCol: String,
      sumCols: Seq[String] = Nil, buckets: Int = 32,
      salt: String = "skew"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(!df.columns.contains("__salt"),
      "input already has a '__salt' column — rename it before saltedAgg")
    val saltCol: Column =
      pmod(Sampling.hashBucket(col(idCol), salt), lit(buckets.toLong))
    val partial = df.withColumn("__salt", saltCol)
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sumCols.map(c => sum(col(c).cast("long")).as(s"__s_$c")): _*)
    partial.groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"),
        sumCols.map(c => sum(col(s"__s_$c")).as(s"sum_$c")): _*)
  }
}
