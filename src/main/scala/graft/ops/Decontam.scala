package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share word
  * n-grams with an evaluation set — the standard leakage check a
  * pre-training pipeline runs before a corpus ships.
  *
  * The benchmark side is distinct n-grams of a (small) eval suite and
  * is broadcast; the corpus side explodes its distinct n-grams once and
  * semi-aggregates hits per document. One shuffle (the per-doc count);
  * the n-gram explode is row-local. At 100 TB the corpus side stays
  * partition-parallel and the broadcast side is bounded by the eval
  * suite's size — if an eval set ever outgrew the broadcast threshold,
  * dropping the `broadcast` hint degrades gracefully to a shuffle join.
  */
object Decontam {

  /** Distinct word n-grams per row: (id, gram). Rows shorter than `n`
    * words contribute nothing. */
  private[ops] def grams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(TextAnalysis.wordGrams(col(textCol), n)).as("gram"))

  /** (id, hits) for every corpus document sharing at least `minHits`
    * distinct n-grams with the benchmark set. `hits` counts distinct
    * contaminated n-grams, the usual reporting unit. */
  def contaminated(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8, minHits: Long = 1L): DataFrame = {
    val benchGrams = grams(bench, idCol, textCol, n)
      .select(col("gram")).distinct()
    grams(corpus, idCol, textCol, n)
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("hits")) // grams are distinct per id already
      .filter(col("hits") >= minHits)
  }

  /** Per-(document, benchmark item) contamination audit: which corpus
    * documents share ≥ `minHits` distinct n-grams with WHICH benchmark
    * rows — the view a leakage investigation reads ("items of eval X
    * appear verbatim in these documents"), where [[contaminated]] only
    * answers the shipping question ("drop these docs"). Same cost
    * shape: the bench side stays the broadcast side (bounded by the
    * benchmark), the corpus side pays one gram explode + one grouped
    * count — the pair cardinality is true contamination, never
    * corpus × bench. */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
      idCol: String, benchIdCol: String, textCol: String,
      n: Int = 8, minHits: Long = 1L): DataFrame = {
    val benchGrams = grams(bench, benchIdCol, textCol, n)
      .select(col("id").as("bench_id"), col("gram")).distinct()
    grams(corpus, idCol, textCol, n)
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("id"), col("bench_id"))
      .agg(count(lit(1)).as("hits")) // distinct per (doc, bench) pair
      .filter(col("hits") >= minHits)
  }

  /** The corpus minus its contaminated documents — the step a curation
    * run actually ships. One anti-join against the (small) flagged set. */
  def clean(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8, minHits: Long = 1L): DataFrame = {
    val flagged = contaminated(corpus, bench, idCol, textCol, n, minHits)
      .select(col("id").as(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** Duplicated-span statistics over the corpus itself (the signal
    * behind exact-substring dedup, Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better"): for each document,
    * how many of its distinct word n-grams also appear in at least one
    * OTHER document. Output: (id, n_grams, n_dup_grams, dup_frac);
    * docs shorter than n words contribute no grams and no row.
    *
    * Shape: one corpus-wide (gram → doc-frequency) aggregate + the
    * inverted-index join back — the same shuffle class as the Jaccard
    * candidate step; nothing is pairwise, so a boilerplate gram shared
    * by k docs costs k join rows, not k². */
  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val g = grams(df, idCol, textCol, n)
    // grams are distinct per id, so a count over the gram partition =
    // document frequency. The window formulation evaluates the gram
    // explode ONCE (a separate freq aggregate + join-back would run the
    // heaviest row-local stage twice — the two Exchange subtrees differ,
    // so ReuseExchange cannot merge them).
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    g.withColumn("docfreq", count(lit(1)).over(w))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("docfreq") >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_frac",
        round(col("n_dup_grams") / col("n_grams"), 4))
  }
}
