package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed end-to-end curation chain a training-data run ships:
  *
  *   normalize → learned-quality cut → canonical exact dedup →
  *   MinHash near-dup greedy keep → exact-substring span removal →
  *   n-gram decontamination → DSIR importance resampling
  *
  * Every stage is an already-gated operator ([[TextAnalysis.normalizeText]],
  * [[QualityClassifier.score]], [[Dedup.keepCanonical]],
  * [[Dedup.minhashDedup]] + [[Dedup.greedyKeepFromPairs]],
  * [[Decontam.stripDupSpans]], [[Decontam.clean]], [[Dsir.resample]]);
  * this object pins their COMPOSITION — the seams (column collisions,
  * null-text policy, determinism across stages) where pipeline bugs
  * actually hide. The `q_doc_pipeline` gate replays the whole chain in
  * DuckDB over the exported `qlr_model`, `pipeline_pairs` and
  * `pipeline_lambda` policy seams.
  *
  * Scale shape: each stage keeps its own 100 TB contract (row-local
  * normalize/score projections, one content-hash groupBy, banded LSH —
  * never all-pairs, two-stage gram-df for span removal, broadcast
  * bench grams, broadcast λ table); composition adds NO new shuffle
  * class — the corpus flows through once, shrinking at every stage, so
  * the chain's cost is bounded by its heaviest single stage on the
  * UNFILTERED input (the MinHash sketch pass runs post-quality,
  * post-exact-dedup, on an already-reduced corpus).
  */
object Curation {

  /** Null/blank-text rows leave the pipeline at the door: a curation
    * run has no use for empty documents, and every downstream stage
    * (content hash, shingles, grams) would need its own null policy. */
  private def dropBlank(df: DataFrame, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")

  /** Stages 1–3: normalize the text in place, keep documents the
    * learned quality filter scores positive (logit > 0 ⇔ p > ½), then
    * keep exactly the canonical (min-id) row of every exact-content
    * group. Exposed separately because the MinHash pair table over THIS
    * intermediate corpus is the `pipeline_pairs` oracle seam — one
    * derivation feeds the gate and the export. */
  def normalizedSurvivors(docs: DataFrame, model: QualityClassifier.LrModel,
      idCol: String, textCol: String): DataFrame = {
    val norm = dropBlank(docs, textCol)
      .withColumn(textCol, TextAnalysis.normalizeText(col(textCol)))
    val kept = QualityClassifier.score(norm, model, idCol, textCol)
      .filter(col("score_e4") > 0L).drop("score_e4")
    Dedup.keepCanonical(kept, idCol, textCol)
  }

  /** The benchmark set as every bench-consuming stage reads it:
    * blank-dropped and normalized in place — ONE derivation shared by
    * the decontamination grams and the DSIR target distribution, so the
    * two stages can never disagree about what "the benchmark" is. */
  def normalizedBench(bench: DataFrame, textCol: String): DataFrame =
    dropBlank(bench, textCol)
      .withColumn(textCol, TextAnalysis.normalizeText(col(textCol)))

  /** Stages 4–5 over an already-normalized canonical corpus: greedy
    * first-wins near-dup admission from `pairs` (the ingest-order
    * semantics of [[Dedup.greedyKeepFromPairs]]), then drop every
    * survivor sharing a word `decontamN`-gram with the (normalized)
    * benchmark set. */
  def curateFrom(canon: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, pairs: DataFrame, decontamN: Int = 8): DataFrame = {
    val near = Dedup.greedyKeepFromPairs(canon, idCol, pairs)
    Decontam.clean(near, normalizedBench(bench, textCol), idCol, textCol,
      n = decontamN)
  }

  /** Stages 4–6 of the FULL modern chain: greedy near-dup keep →
    * exact-substring span removal (cross-document duplicated
    * `dupN`-gram positions deleted and the text rebuilt,
    * [[Decontam.stripDupSpans]] — all-duplicate docs leave the corpus)
    * → `decontamN`-gram benchmark decontamination over the REBUILT
    * text. Span removal runs before decontam on purpose: a duplicated
    * span that also hits the benchmark is gone either way, but decontam
    * flags whole documents while span removal salvages them — running
    * removal first keeps the salvageable mass. Exposed separately
    * because this frame is the corpus the DSIR λ table is fit on — the
    * `pipeline_lambda` oracle seam reads it. */
  def cleanedStage(canon: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, pairs: DataFrame, decontamN: Int = 8,
      dupN: Int = 8): DataFrame = {
    val near = Dedup.greedyKeepFromPairs(canon, idCol, pairs)
    val stripped = Decontam.stripDupSpans(near, idCol, textCol, n = dupN)
      .select(col(idCol), col(textCol))
    Decontam.clean(stripped, normalizedBench(bench, textCol), idCol, textCol,
      n = decontamN)
  }

  /** Stage 7: DSIR importance resampling of the cleaned corpus TOWARD
    * the benchmark domain ([[Dsir.resample]] with the normalized bench
    * set as the target distribution). Complementary to decontamination
    * by design: decontam removes VERBATIM `n`-gram leakage, DSIR then
    * shifts the surviving corpus toward the benchmark's hashed
    * unigram+bigram DISTRIBUTION — the paper's "select data that looks
    * like the target without being the target". Keeps the accepted
    * rows with the audit columns dropped. */
  def resampleStage(cleaned: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, tauE4: Long = 7000L, buckets: Int = 4096): DataFrame =
    resampleStageWith(cleaned,
      Dsir.logRatioWeights(cleaned, normalizedBench(bench, textCol), idCol,
        textCol, buckets),
      idCol, textCol, tauE4, buckets)

  /** [[resampleStage]] with an externally fitted λ table — the apply
    * half of the fit/apply seam (same pattern as `pairs` injection in
    * [[curate]]): a run fits λ ONCE on the cleaned corpus, exports it
    * as the `pipeline_lambda` policy seam, and every consumer applies
    * the same integers instead of refitting per action. Identical
    * output to [[resampleStage]] when `lambda` is
    * [[Dsir.logRatioWeights]](cleaned, normalizedBench(bench)). */
  def resampleStageWith(cleaned: DataFrame, lambda: DataFrame, idCol: String,
      textCol: String, tauE4: Long = 7000L, buckets: Int = 4096): DataFrame =
    Dsir.resampleWith(cleaned, lambda, idCol, textCol, tauE4, buckets)
      .filter(col("accept") === 1)
      .drop("w_e4", "accept")

  /** The original 5-stage chain from raw documents (kept as the
    * compact composition seam — [[curateFull]] is the shipping chain).
    * `pairs` may inject a precomputed MinHash pair table over
    * [[normalizedSurvivors]]'s output (the gate does, to share the
    * exported seam); when absent the chain computes its own at
    * `threshold`. */
  def curate(docs: DataFrame, bench: DataFrame,
      model: QualityClassifier.LrModel, idCol: String, textCol: String,
      threshold: Double = 0.8, decontamN: Int = 8,
      pairs: Option[DataFrame] = None): DataFrame = {
    val canon = normalizedSurvivors(docs, model, idCol, textCol)
    val p = pairs.getOrElse(
      Dedup.minhashDedup(canon, idCol, textCol, threshold))
    curateFrom(canon, bench, idCol, textCol, p, decontamN)
  }

  /** The FULL modern chain from raw documents: all seven stages
    * (normalize → LR cut → exact dedup → MinHash greedy keep →
    * span removal → decontamination → DSIR resampling). */
  def curateFull(docs: DataFrame, bench: DataFrame,
      model: QualityClassifier.LrModel, idCol: String, textCol: String,
      threshold: Double = 0.8, decontamN: Int = 8, dupN: Int = 8,
      tauE4: Long = 7000L, buckets: Int = 4096,
      pairs: Option[DataFrame] = None): DataFrame = {
    val canon = normalizedSurvivors(docs, model, idCol, textCol)
    val p = pairs.getOrElse(
      Dedup.minhashDedup(canon, idCol, textCol, threshold))
    resampleStage(
      cleanedStage(canon, bench, idCol, textCol, p, decontamN, dupN),
      bench, idCol, textCol, tauE4, buckets)
  }
}
