package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** fastText-style quality classifier (Joulin et al. 2016,
  * arXiv:1607.01759 — the public linear-classifier-over-hashed-ngram
  * recipe every web-scale curation pipeline runs as its learned
  * quality filter): logistic regression over the SAME hashed
  * unigram+bigram bucket features as [[Dsir]], trained once on a small
  * labeled set and then applied row-locally to the full corpus.
  *
  * The split mirrors the repo's other fitted models (IVF k-means,
  * PCA): TRAINING is a bounded driver-side fit — labeled quality sets
  * are eval-suite-sized by construction (human labels or a distilled
  * heuristic on a slice), and the collect refuses loudly past its row
  * cap, the same `limit(cap+1)` contract as `keepAboveQuantile` — and
  * the fitted model is quantized ONCE to e8 fixed-point integers. Both
  * the scorer and the oracle read those SAME integers (the gate
  * exports them at the `qlr_model` policy seam, like `pca_basis`), so
  * SCORING is engine-exact: per-doc feature counts are integers, the
  * weighted sum Σ cnt·w_e8 is an exact integer aggregate
  * (order-invariant at 1000 executors), and the logit is one fixed
  * IEEE chain — `(bias_e8 + s_e8/n) / 10⁴` rounded to e4 — any engine
  * replays it bit-for-bit.
  *
  * Scale shape of [[score]]: feature extraction row-local (in-row hash
  * transform + codegen TokenCounts, no corpus token explode); the
  * weight table is ≤ `buckets` rows and BROADCASTS; one
  * map-side-combined groupBy on the doc id. Nothing iterative touches
  * the corpus — the GD loop runs on the driver over the bounded
  * training sample only. */
object QualityClassifier {

  /** A fitted, e8-quantized linear model. `weightsE8(f)` is the fixed
    * point round(w_f · 10⁸); features are [[Dsir.featureCounts]]
    * buckets under (`buckets`, `salt`). */
  final case class LrModel(buckets: Int, salt: String, biasE8: Long,
      weightsE8: Array[Long]) {
    require(weightsE8.length == buckets,
      s"weight vector (${weightsE8.length}) must cover all $buckets buckets")
    /** The nonzero weights as a (feat, w_e8) frame — the broadcast side
      * of [[score]]. [[exportDf]] adds the bias for the oracle seam. */
    def weightsDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      weightsE8.zipWithIndex.collect { case (w, f) if w != 0L =>
        (f.toLong, w) }.toSeq.toDF("feat", "w_e8")
    }
    /** Weights plus the bias as the reserved feat = −1 row (no hash
      * bucket is negative), the `qlr_model` oracle-aux table. */
    def exportDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      weightsDf(spark).union(Seq((-1L, biasE8)).toDF("feat", "w_e8"))
    }
  }

  /** Full-batch logistic regression on the driver over a bounded
    * labeled set. Deterministic by construction: the feature rows come
    * back through a `limit(maxRows + 1)` probe (loud refusal past the
    * cap — a labeled quality set that big should be subsampled, not
    * silently truncated), documents are processed in sorted-id order,
    * and the learning-rate/iteration schedule is fixed — the same
    * labeled frame fits to the same bits on any cluster and any
    * partitioning. Features are L1-normalized per document (cnt/Σcnt,
    * the fastText mean pool), so long documents don't dominate the
    * gradient. `labelCol` must be 0/1. */
  def train(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = 4096, salt: String = "qlr",
      iters: Int = 50, lr: Double = 0.5,
      maxRows: Int = 2000000): LrModel = {
    require(iters >= 1 && lr > 0.0, s"bad schedule: iters=$iters lr=$lr")
    // both collected sides key documents by LONG id — refuse non-integral
    // id columns loudly (a string id would cast to null silently and a
    // raw getLong would throw an undocumented ClassCastException)
    val idType = labeled.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType).contains(idType),
      s"idCol '$idCol' must be an integral type for the bounded driver " +
        s"fit (got $idType) — hash or index your ids to long first")
    val featRows = Dsir.featureCounts(labeled, idCol, textCol, buckets, salt)
      .select(col("id").cast("long").as("id"), col("feat"), col("cnt"))
      .limit(maxRows + 1).collect()
    require(featRows.length <= maxRows,
      s"labeled set exceeds $maxRows feature rows — subsample the " +
        "training set (the fit is a bounded driver-side step by contract)")
    val labelRows = labeled
      .select(col(idCol).cast("long"), col(labelCol).cast("double"))
      .limit(maxRows + 1).collect()
    require(labelRows.length <= maxRows,
      s"labeled set exceeds $maxRows rows — subsample the training set")
    val docFeats: Map[Long, Array[(Int, Long)]] = featRows
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
      .groupBy(_._1)
      .map { case (id, l) =>
        id -> l.map(t => (t._2, t._3)).sortBy(_._1) }
    val docs = labelRows.map { r =>
      require(!r.isNullAt(1) && (r.getDouble(1) == 0.0 || r.getDouble(1) == 1.0),
        s"labels must be 0/1, got ${r.get(1)} for id ${r.get(0)}")
      (r.getLong(0), r.getDouble(1))
    }.sortBy(_._1)
    require(docs.nonEmpty, "empty training set")
    val w = new Array[Double](buckets)
    var b = 0.0
    val m = docs.length.toDouble
    for (_ <- 1 to iters) {
      val gw = new Array[Double](buckets)
      var gb = 0.0
      for ((id, y) <- docs) {
        val fs = docFeats.getOrElse(id, Array.empty[(Int, Long)])
        val n = fs.iterator.map(_._2).sum.toDouble
        val z = b + (if (n > 0)
          fs.iterator.map { case (f, c) => c * w(f) }.sum / n else 0.0)
        val g = 1.0 / (1.0 + math.exp(-z)) - y
        gb += g
        if (n > 0) for ((f, c) <- fs) gw(f) += g * c / n
      }
      b -= lr * gb / m
      var f = 0
      while (f < buckets) { w(f) -= lr * gw(f) / m; f += 1 }
    }
    LrModel(buckets, salt, math.round(b * 1e8), w.map(x => math.round(x * 1e8)))
  }

  /** The corpus decorated with `scoreCol` = round((bias_e8 + s_e8/n) /
    * 10⁴) — the e4 fixed-point logit (monotone in p, so thresholding
    * the logit IS thresholding the probability; no exp on the hot
    * path). Docs with no features (empty/null text) score the bare
    * bias. Engine-exact: integers in, one IEEE division + round out. */
  def score(corpus: DataFrame, model: LrModel, idCol: String,
      textCol: String, scoreCol: String = "score_e4"): DataFrame = {
    for (c <- Seq(scoreCol, "__s_e8", "__n_units"))
      require(!corpus.columns.contains(c),
        s"input already has a '$c' column — rename it first")
    val sums = Dsir.featureCounts(corpus, idCol, textCol, model.buckets,
        model.salt)
      .join(broadcast(model.weightsDf(corpus.sparkSession)), Seq("feat"), "left")
      .groupBy("id")
      .agg(sum(col("cnt") * coalesce(col("w_e8"), lit(0L))).as("__s_e8"),
        sum(col("cnt")).as("__n_units"))
      .withColumnRenamed("id", idCol)
    corpus.join(sums, Seq(idCol), "left")
      .withColumn(scoreCol,
        round((lit(model.biasE8.toDouble) +
          coalesce(col("__s_e8").cast("double") / col("__n_units").cast("double"),
            lit(0.0))) / 10000.0).cast("long"))
      .drop("__s_e8", "__n_units")
  }

  /** The shipping filter: rows whose logit clears `tauE4` (tau = 0 is
    * p > ½). One row-local comparison over [[score]]'s output. */
  def keepAbove(corpus: DataFrame, model: LrModel, idCol: String,
      textCol: String, tauE4: Long = 0L): DataFrame =
    score(corpus, model, idCol, textCol).filter(col("score_e4") > tauE4)
}
