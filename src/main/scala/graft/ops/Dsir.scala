package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling", arXiv:2302.03169 — public method): score every raw
  * document by how target-like its hashed n-gram profile is under a
  * target-vs-raw bag-of-features model, then keep documents by a
  * deterministic acceptance test whose keep-probability is the
  * (capped) importance ratio.
  *
  * Every stage is engine-exact so a DuckDB oracle replays the whole
  * chain bit-for-bit: features are salted-md5 hash buckets
  * ([[Sampling.hashBucket]]), the two LMs are add-one-smoothed bucket
  * frequencies whose log-probabilities round to the repo's standard
  * e4 fixed point, a document's log-weight is an exact integer sum of
  * cnt·λ_e4, and acceptance compares `round(ln(u)·10⁴)` (u a salted
  * uniform from the row key) against `w_e4 − τ_e4` — integers on both
  * sides of the comparison. P(accept) = min(1, e^((w−τ)/10⁴)), i.e.
  * importance-proportional sampling with a cap, reproducible on any
  * cluster and any partitioning (same contract as [[Sampling]]).
  *
  * Scale shape: feature extraction is ROW-LOCAL (tokens + bigrams →
  * in-row hash transform → the codegen [[graft.functions.TokenCounts]]
  * fold — no corpus-wide token explode ever shuffles); each LM is one
  * map-side-combined aggregate bounded by `buckets` rows; λ is a
  * ≤`buckets`-row table and BROADCASTS to the per-doc weight join;
  * the weight sum is one map-side-combined groupBy on the doc id. The
  * target side is an eval-suite-sized frame by construction (DSIR's
  * premise), the raw side streams through map work + two bounded
  * aggregates — nothing pairwise, nothing driver-side.
  */
object Dsir {

  private val E4 = 10000.0

  /** round(ln(x)·10⁴) as an exact integer — the repo's portable
    * fixed-point log (see TextAnalysis.unigramNll). */
  private def lnE4(x: Column): Column =
    round(log(x) * E4).cast("long")

  /** The hashed feature id of one n-gram unit, as a string (so the
    * row-local [[graft.functions.TokenCounts]] fold can count bucket
    * occurrences in-row). */
  private def bucketOf(unit: Column, buckets: Int, salt: String): Column =
    pmod(conv(substring(md5(concat(unit, lit(":" + salt))), 1, 8), 16, 10)
      .cast("long"), lit(buckets.toLong)).cast("string")

  /** Per-document hashed n-gram feature counts: (id, feat, cnt) over
    * lower-cased whitespace unigrams + bigrams hashed into `buckets`
    * buckets. Entirely row-local: the unit array, the hash transform
    * and the occurrence count all run inside the scan projection; the
    * output is one row per (doc, distinct bucket). Empty-text docs
    * tokenize to nothing and are absent; so are null texts. */
  def featureCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4096, salt: String = "dsir"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val low = lower(col(textCol))
    val units = filter(
      concat(TextAnalysis.wsTokens(low),
        TextAnalysis.wordGrams(low, 2, distinct = false)),
      u => u =!= "")
    df.select(col(idCol).as("id"),
        explode(graft.functions.TokenCounts(
          transform(units, u => bucketOf(u, buckets, salt)))).as("t"))
      .select(col("id"), col("t.term").cast("long").as("feat"),
        col("t.tf").as("cnt"))
  }

  /** Per-feature e4 log-ratio weights λ = ln p_target(f) − ln p_raw(f)
    * under add-one smoothing over the `buckets`-bucket space:
    * (feat, lambda_e4), one row per feature observed on either side.
    * Both aggregates are bounded by `buckets`; the result is a
    * plan-small table meant to broadcast. */
  def logRatioWeights(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096,
      salt: String = "dsir"): DataFrame = {
    val cf = featureCounts(corpus, idCol, textCol, buckets, salt)
      .groupBy("feat").agg(sum("cnt").as("cc"))
    val tf = featureCounts(target, idCol, textCol, buckets, salt)
      .groupBy("feat").agg(sum("cnt").as("tc"))
    val j = cf.join(tf, Seq("feat"), "full_outer")
      .select(col("feat"), coalesce(col("cc"), lit(0L)).as("cc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
    val tot = j.agg(sum("cc").as("nc"), sum("tc").as("nt"))
    val b = lit(buckets.toLong)
    j.crossJoin(broadcast(tot))
      .select(col("feat"),
        (lnE4((col("tc") + 1L).cast("double") /
            (col("nt") + b).cast("double"))
          - lnE4((col("cc") + 1L).cast("double") /
            (col("nc") + b).cast("double"))).as("lambda_e4"))
  }

  /** Per-document importance log-weight: (id, w_e4) with
    * w = Σ_f cnt_f · λ_f — an exact integer sum. Docs with no features
    * (empty/null text) are absent; [[resample]] treats them as w = 0. */
  def importanceWeights(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096,
      salt: String = "dsir"): DataFrame =
    weightsWith(corpus,
      logRatioWeights(corpus, target, idCol, textCol, buckets, salt),
      idCol, textCol, buckets, salt)

  /** The per-document weight sum under an externally fitted λ — the one
    * derivation shared by [[importanceWeights]] and [[resampleWith]]. */
  private def weightsWith(corpus: DataFrame, lambda: DataFrame,
      idCol: String, textCol: String, buckets: Int,
      salt: String): DataFrame =
    featureCounts(corpus, idCol, textCol, buckets, salt)
      .join(broadcast(lambda), "feat")
      .groupBy("id")
      .agg(sum(col("cnt") * col("lambda_e4")).as("w_e4"))

  /** The corpus decorated with (w_e4, accept): accept = 1 iff
    * round(ln(u)·10⁴) < (w_e4 − w̄_e4) − τ_e4, where u =
    * (hashBucket(id)+1)/2³² ∈ (0, 1] is a deterministic draw and w̄ is
    * the corpus MEAN log-weight — i.e. keep-probability
    * min(1, e^((w−w̄−τ)/10⁴)). Raw DSIR log-ratios are uniformly
    * negative (the raw corpus IS less target-like than the target —
    * that's the premise), so the practical recipe normalizes before
    * sampling; centering on the mean makes τ the knob it should be:
    * τ = 0 keeps an average document with probability ~1, τ_e4 = 7000
    * with probability ~½, always favoring target-like documents. The
    * mean never materializes as a rounded value: the comparison is
    * multiplied through by n — `n·(ln(u)e4 + τ) < n·w − Σw`, exact
    * integers on both sides, carried as DECIMAL(38,0): |w_e4| can reach
    * ~10¹²–10¹³ on megadocs (doc length × |λ_e4|) and n ~10¹² at
    * 100 TB, so n·w and Σw overflow a Long (~9·10¹⁸) long before they
    * threaten 38 decimal digits — decimal keeps the boundary exact with
    * no floating point and no silent wrap. Cost: one corpus-scalar
    * aggregate (Σw, n) broadcast back — a second pass over the joined
    * frame, nothing driver-side. */
  def resample(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, tauE4: Long, buckets: Int = 4096,
      salt: String = "dsir", acceptSalt: String = "dsir-accept"): DataFrame =
    resampleWith(corpus,
      logRatioWeights(corpus, target, idCol, textCol, buckets, salt),
      idCol, textCol, tauE4, buckets, salt, acceptSalt)

  /** [[resample]] with an externally fitted λ table — the apply half of
    * the fit/apply seam. A pipeline fits λ once (it is a policy
    * artifact, exported for the oracle like the LR quality model) and
    * applies it to the corpus; refitting per consumer re-runs both
    * corpus-side feature aggregates for the same integers. Identical
    * output to [[resample]] when `lambda` is
    * [[logRatioWeights]](corpus, target). */
  def resampleWith(corpus: DataFrame, lambda: DataFrame, idCol: String,
      textCol: String, tauE4: Long, buckets: Int = 4096,
      salt: String = "dsir", acceptSalt: String = "dsir-accept"): DataFrame = {
    for (c <- Seq("w_e4", "accept", "__sw", "__nw"))
      require(!corpus.columns.contains(c),
        s"input already has a '$c' column — rename it first")
    val w = weightsWith(corpus, lambda, idCol, textCol, buckets, salt)
      .withColumnRenamed("id", idCol)
    val joined = corpus.join(w, Seq(idCol), "left")
      .withColumn("w_e4", coalesce(col("w_e4"), lit(0L)))
    // Σw as decimal: a Long sum wraps once n·|w| passes ~9·10¹⁸.
    // The normalizer re-derives (Σw, n) from the ID-PROJECTED corpus
    // joined to the same w subtree — identical sums (including under
    // duplicate ids) to aggregating `joined` itself, but the second
    // evaluation of the corpus carries one id column instead of the
    // full text payload (guide §2.3: project before the exchange), and
    // the w aggregate's exchange is canonically identical to the one
    // in `joined`, so ReuseExchange serves it from shuffle files
    // instead of recomputing the feature pass.
    val norm = corpus.select(col(idCol)).join(w, Seq(idCol), "left")
      .agg(sum(coalesce(col("w_e4"), lit(0L)).cast("decimal(38,0)")).as("__sw"),
        count(lit(1)).as("__nw"))
    val u = (Sampling.hashBucket(col(idCol), acceptSalt) + 1L).cast("double") /
      lit(4294967296.0)
    // decimal(19,0) operands → decimal(38,0) products (Spark caps the
    // result precision at 38; the true magnitudes stay ≤ ~10²⁵)
    val nwDec = col("__nw").cast("decimal(19,0)")
    joined.crossJoin(broadcast(norm))
      .withColumn("accept",
        ((round(log(u) * E4).cast("long") + lit(tauE4)).cast("decimal(19,0)")
            * nwDec <
          col("w_e4").cast("decimal(19,0)") * nwDec - col("__sw")).cast("int"))
      .drop("__sw", "__nw")
  }
}
