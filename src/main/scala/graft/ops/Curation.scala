package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed end-to-end curation chain a training-data run ships:
  *
  *   normalize → learned-quality cut → canonical exact dedup →
  *   MinHash near-dup greedy keep → n-gram decontamination
  *
  * Every stage is an already-gated operator ([[TextAnalysis.normalizeText]],
  * [[QualityClassifier.score]], [[Dedup.keepCanonical]],
  * [[Dedup.minhashDedup]] + [[Dedup.greedyKeepFromPairs]],
  * [[Decontam.clean]]); this object pins their COMPOSITION — the seams
  * (column collisions, null-text policy, determinism across stages)
  * where pipeline bugs actually hide. The `q_doc_pipeline` gate replays
  * the whole chain in DuckDB over the exported `qlr_model` and
  * `pipeline_pairs` policy seams.
  *
  * Scale shape: each stage keeps its own 100 TB contract (row-local
  * normalize/score projections, one content-hash groupBy, banded LSH —
  * never all-pairs, broadcast bench grams); composition adds NO new
  * shuffle class — the corpus flows through once, shrinking at every
  * stage, so the chain's cost is bounded by its heaviest single stage
  * on the UNFILTERED input (the MinHash sketch pass runs post-quality,
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

  /** Stages 4–5 over an already-normalized canonical corpus: greedy
    * first-wins near-dup admission from `pairs` (the ingest-order
    * semantics of [[Dedup.greedyKeepFromPairs]]), then drop every
    * survivor sharing a word `decontamN`-gram with the (normalized)
    * benchmark set. */
  def curateFrom(canon: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, pairs: DataFrame, decontamN: Int = 8): DataFrame = {
    val near = Dedup.greedyKeepFromPairs(canon, idCol, pairs)
    val benchNorm = dropBlank(bench, textCol)
      .withColumn(textCol, TextAnalysis.normalizeText(col(textCol)))
    Decontam.clean(near, benchNorm, idCol, textCol, n = decontamN)
  }

  /** The full chain from raw documents. `pairs` may inject a
    * precomputed MinHash pair table over [[normalizedSurvivors]]'s
    * output (the gate does, to share the exported seam); when absent
    * the chain computes its own at `threshold`. */
  def curate(docs: DataFrame, bench: DataFrame,
      model: QualityClassifier.LrModel, idCol: String, textCol: String,
      threshold: Double = 0.8, decontamN: Int = 8,
      pairs: Option[DataFrame] = None): DataFrame = {
    val canon = normalizedSurvivors(docs, model, idCol, textCol)
    val p = pairs.getOrElse(
      Dedup.minhashDedup(canon, idCol, textCol, threshold))
    curateFrom(canon, bench, idCol, textCol, p, decontamN)
  }
}
