package graft.ops

import graft.functions.Hash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline: a single projection +
  * global top-k (TakeOrderedAndProject — no full sort materialization).
  * The scale path is sign-random-projection LSH: a deterministic set of
  * hyperplanes buckets vectors by sign pattern; queries search only
  * matching buckets (optionally multi-probing 1-bit-flipped neighbors).
  * At 100 TB the bucket table is the only shuffle, and per-bucket
  * candidate sets stay small.
  *
  * Dot products run in double precision via codegen'd higher-order
  * functions (`zip_with` + `aggregate`) — no UDF on the hot path.
  */
object Similarity {

  /** Cosine similarity between two float-array columns, computed in
    * double (deterministic left-to-right summation). Backed by the
    * codegen'd [[graft.functions.CosineSimilarity]] expression — one
    * primitive loop per pair instead of three interpreted higher-order
    * folds, with the identical accumulation/division order (the DuckDB
    * oracle computes `dot / sqrt(na) / sqrt(nb)` the same way). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Cluster-balanced cap (topic balancing): keep at most `cap` vectors
    * per IVF cell, chosen by salted-hash rank with a key tie-break —
    * the embedding-space counterpart of `Urls.capPerDomain`, the pass
    * that stops one dense topic cluster from dominating a training mix.
    * Returns (input columns ..., cell, rank), rank ≤ cap. Deterministic
    * on any cluster and any partitioning: the k-means fit is the seeded
    * bounded-sample [[Ivf.trainCentroids]] (pure function of the
    * corpus), assignment is the row-local codegen nearest-cell
    * expression, and the keep set is a pure function of (id, salt).
    * Cost: one row-local assignment pass + ONE rank window shuffled on
    * the cell id (cells hold ~corpus/nLists rows; for very skewed
    * clusterings raise nLists — cell granularity is the parallelism). */
  def capPerCluster(emb: DataFrame, idCol: String, vecCol: String,
      nLists: Int, cap: Int, salt: String = "ccap"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(!emb.columns.contains("cell"),
      "input already has a 'cell' column — rename it first")
    Sampling.stratifiedSample(
      Ivf.build(emb, idCol, vecCol, nLists).cells, idCol, "cell", cap, salt)
  }

  /** Exact top-k by cosine against one query vector. */
  def topK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    emb.select(col(idCol),
        round(cosine(col(vecCol), lit(query)), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic hyperplanes: `planes` pseudo-random unit directions
    * seeded from the plane index — same buckets on every run/cluster. */
  def hyperplanes(dim: Int, planes: Int, seed: Long = 42L): Array[Array[Float]] =
    Array.tabulate(planes) { p =>
      val v = Array.tabulate(dim) { i =>
        val h = Hash64.hashString(s"$seed:$p:$i")
        // map hash to (-1, 1)
        (h.toDouble / Long.MaxValue.toDouble).toFloat
      }
      v
    }

  /** Sign-pattern bucket id of a vector under the given hyperplanes —
    * the codegen'd [[graft.functions.SignBucketExpr]] (one primitive
    * loop inside whole-stage codegen; the former UDF paid a Seq wrapper
    * + dispatch per corpus row, the dominant cost of a `buildLsh` pass). */
  def bucketCol(planes: Array[Array[Float]], vec: Column): Column =
    graft.functions.SignBucketExpr(vec, planes)

  /** Bucket the corpus once (materialize + reuse across queries). */
  def buildLsh(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int = 12, dim: Int = 64): DataFrame = {
    val hp = hyperplanes(dim, planes)
    emb.select(col(idCol), col(vecCol), bucketCol(hp, col(vecCol)).as("bucket"))
  }

  /** Approximate top-k: search the query's bucket plus all 1-bit-flip
    * neighbor buckets (multi-probe), then exact cosine within. `planes`
    * and `dim` MUST match the [[buildLsh]] call that produced
    * `bucketed` — the query's sign pattern is only comparable to the
    * stored buckets under the SAME hyperplanes, so the query dot uses
    * the index's `dim` (not the query's own length, which would derive
    * different planes and probe the wrong buckets whenever the two
    * differ). */
  def lshTopK(bucketed: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, planes: Int = 12, dim: Int = 64,
      probeBits: Int = 1): DataFrame =
    lshCandidates(bucketed, idCol, vecCol, query, planes, dim, probeBits)
      .select(col(idCol), round(cosine(col(vecCol), lit(query)), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** The candidate rows [[lshTopK]] rescans exactly — exposed so the
    * oracle export can dump the candidate ids and DuckDB can recheck
    * the top-k as brute-force-over-candidates (the bucket policy is the
    * approximate part; candidate scoring and ranking are exact). */
  def lshCandidates(bucketed: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], planes: Int = 12, dim: Int = 64,
      probeBits: Int = 1): DataFrame =
    bucketed.filter(col("bucket").isin(
      probeBuckets(query, planes, dim, probeBits): _*))

  /** Sign bucket of the query plus every bucket within `probeBits` bit
    * flips (multi-probe) — the ONE derivation of the bucket-probe policy,
    * shared by [[lshTopK]] and the oracle export. 1 flip = the classic
    * query-bucket + 1-bit neighbors; higher trades candidate count for
    * recall — still a tiny fraction of the 2^planes bucket space. */
  def probeBuckets(query: Array[Float], planes: Int = 12, dim: Int = 64,
      probeBits: Int = 1): Seq[Long] = {
    val hp = hyperplanes(dim, planes)
    var bucket = 0L
    for (p <- hp.indices) {
      var dot = 0.0
      var i = 0
      val n = math.min(query.length, dim)
      while (i < n) { dot += hp(p)(i) * query(i); i += 1 }
      if (dot >= 0) bucket |= (1L << p)
    }
    var probes = Set(bucket)
    for (_ <- 1 to probeBits)
      probes = probes ++ probes.flatMap(b => (0 until planes).map(p => b ^ (1L << p)))
    probes.toSeq.sorted
  }

  /** Pair similarity over [[candidatePairs]] output: the dot of the pair
    * divided by each side's PRECOMPUTED norm — per pair one array loop
    * instead of [[cosine]]'s fused three-accumulator pass (at n² pairs
    * the norms are n²·redundant). The sqrt is hoisted per ROW too
    * (`na`/`nb` carry `sqrt(self-dot)`): two sqrts per pair were ~n²/2
    * of pure redundant work. Bit-exact with `cosine(va, vb)`: same
    * left-to-right accumulation per term, same `dot / sqrt(na2) /
    * sqrt(nb2)` operation order — hoisting sqrt(na2) to the row changes
    * WHERE it runs, not the double it produces (pinned in OpsSpec). */
  private[graft] def pairSim: Column =
    graft.functions.DotProduct(col("va"), col("vb")) / col("na") / col("nb")

  /** Candidate (a, b, va, vb, na, nb) pairs with a < b. Small inputs
    * (≤ `maxBrute` rows) get the exact O(n²) nested-loop pass — the
    * verification path. Larger inputs are routed through LSH buckets
    * automatically: only same-bucket pairs are emitted (the standard
    * near-dup candidate contract — highly similar vectors share sign
    * patterns), so cost stays near-linear instead of quadratic. Callers
    * needing exact pairs over a large corpus must slice it first; an
    * unguarded API would silently BroadcastNestedLoopJoin 10¹⁰ row pairs
    * at corpus scale. */
  private[graft] def candidatePairs(emb: DataFrame, idCol: String,
      vecCol: String, maxBrute: Long,
      pairPred: Option[Column] = None,
      knownCount: Option[Long] = None): DataFrame = {
    // each side carries its norm (one self-dot + sqrt per ROW) so the
    // n² pair loop only pays the dot — see pairSim.
    // `pairPred` (a [[pairSim]]-based threshold) is ANDed AFTER the
    // cheap ordering conjunct rather than applied as a .filter: a
    // pushed-down filter lands FIRST in the join condition, making the
    // nested loop evaluate the dot product for all n² ordered pairs —
    // with a < b leading, short-circuit halves the similarity work
    def withPred(c: Column): Column = pairPred.fold(c)(p => c && p)
    // a caller-provided "__n" column is the shared substrate contract: a
    // pipeline running several pair passes over one corpus precomputes
    // (id, vec, norm) once (norms are one self-dot per ROW, but the
    // substrate also carries the fan-out repartition and any checkpoint)
    val withNorm =
      if (emb.columns.contains("__n")) emb
      else emb.withColumn("__n",
        sqrt(graft.functions.DotProduct(col(vecCol), col(vecCol))))
    // knownCount skips the sizing job when the caller already holds the
    // corpus size (a pipeline driving several passes over one table
    // counts it once, not once per operator)
    if (knownCount.getOrElse(emb.count()) <= maxBrute) {
      // small corpora usually sit in ONE parquet file — repartition the
      // stream side or the whole O(n²) pass runs on a single task (and
      // the per-pair condition eval is the real cost, so the stream
      // side wants FULL core fan-out, not just a few file splits).
      // An input already fanned to >= the session parallelism (the
      // substrate case) skips the per-call reshuffle.
      val par = emb.sparkSession.sparkContext.defaultParallelism
      val aSel = withNorm.select(col(idCol).as("a"), col(vecCol).as("va"),
        col("__n").as("na"))
      val a = if (withNorm.rdd.getNumPartitions >= par) aSel
              else aSel.repartition(par)
      val b = withNorm.select(col(idCol).as("b"), col(vecCol).as("vb"),
        col("__n").as("nb"))
      a.join(b, withPred(col("a") < col("b")))
    } else {
      // buildLsh projects (id, vec, bucket) — re-attach the row-scale norm
      val bucketed = buildLsh(emb, idCol, vecCol).withColumn("__n",
        sqrt(graft.functions.DotProduct(col(vecCol), col(vecCol))))
      val a = bucketed.select(col(idCol).as("a"), col(vecCol).as("va"),
        col("__n").as("na"), col("bucket"))
      val b = bucketed.select(col(idCol).as("b"), col(vecCol).as("vb"),
        col("__n").as("nb"), col("bucket").as("bucket_b"))
      a.join(b,
          withPred(col("bucket") === col("bucket_b") && col("a") < col("b")))
        .drop("bucket", "bucket_b")
    }
  }

  /** SemDedup — cluster-scoped semantic dedup (the recipe of Abbas et
    * al. 2023, arXiv:2303.09540): k-means cells bound the candidate
    * space, exact cosine ≥ `threshold` decides within a cell, connected
    * components over the edges, keep the min-id member of each. The
    * pairwise pass costs Σ|cell|² instead of |corpus|² — the property
    * that keeps semantic dedup tractable at 100 TB. Cross-cell
    * near-duplicates are the published recall trade, tuned by the cell
    * count (with one cell the op degenerates to the EXACT global dedup
    * — pinned as a parity law in OpsSpec). The cell assignment is one
    * codegen'd scan pass ([[graft.functions.NearestCellExpr]]); the
    * within-cell join shuffles on `cell` only.
    *
    * `nLists = 0` (the default) derives the cell count from the corpus
    * size at a fixed `targetCell`-row target (default ~2048), making
    * total pair work n·targetCell/2 — LINEAR in the corpus (a pinned
    * cell count leaves the pass quadratic across data growth). Pass
    * `nLists` explicitly when the cell policy must be byte-reproducible
    * across corpus sizes; the derivation costs one count job unless
    * `knownCount` is given. BOTH policies are oracle-gated: the pinned
    * path by q_emb_semdedup (nLists = 16, byte-stable cell table) and
    * the derived scale path by q_emb_semdedup_derived (nLists = 0, the
    * derived cell table exported at the same policy seam, DuckDB
    * recomputing everything downstream).
    *
    * Keeps every column of `emb`; rows never paired survive untouched
    * (same keep contract as [[Dedup.keepFromPairs]], which this
    * reuses). */
  def semDedupKeep(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nLists: Int = 0,
      knownCount: Option[Long] = None,
      targetCell: Long = 2048L): DataFrame = {
    require(nLists >= 0, s"nLists must be >= 0 (0 = derive), got $nLists")
    val cells =
      if (nLists > 0) nLists
      else derivedCells(emb, knownCount, targetCell)
    Dedup.keepFromPairs(emb, idCol,
      semDedupPairs(emb, idCol, vecCol, threshold, cells))
  }

  /** The `nLists = 0` cell-count derivation — one place, shared by
    * [[semDedupKeep]] and the oracle-aux export so the gate and its
    * DuckDB replay build the SAME index. */
  private[graft] def derivedCells(emb: DataFrame, knownCount: Option[Long],
      targetCell: Long): Int = {
    require(targetCell >= 1, s"targetCell must be >= 1, got $targetCell")
    val n = knownCount.getOrElse(emb.count())
    math.max(1L, n / targetCell).toInt
  }

  /** The (id, cell) table of the DERIVED-cells policy — exactly the
    * index [[semDedupKeep]] builds internally for `nLists = 0` (same
    * [[derivedCells]] count, same seeded k-means), exposed for the
    * oracle-aux export so DuckDB can recompute the within-cell dedup
    * from the same policy table the gate ran on. */
  private[graft] def semDedupExportCells(emb: DataFrame, idCol: String,
      vecCol: String, knownCount: Option[Long],
      targetCell: Long): DataFrame =
    Ivf.build(emb, idCol, vecCol, derivedCells(emb, knownCount, targetCell))
      .cells.select(col(idCol), col("cell"))

  /** The cell-scoped candidate-edge frame behind [[semDedupKeep]] —
    * exposed so the plan contract (cell-conjunct equi-join, never a
    * corpus² product) is pinnable before keepFromPairs eagerly resolves
    * small edge sets on the driver. */
  private[graft] def semDedupPairs(emb: DataFrame, idCol: String,
      vecCol: String, threshold: Double, nLists: Int): DataFrame = {
    val cells = Ivf.build(emb, idCol, vecCol, nLists).cells
    val withNorm = cells.withColumn("__n",
      sqrt(graft.functions.DotProduct(col(vecCol), col(vecCol))))
    val a = withNorm.select(col(idCol).as("a"), col(vecCol).as("va"),
      col("__n").as("na"), col("cell"))
    val b = withNorm.select(col(idCol).as("b"), col(vecCol).as("vb"),
      col("__n").as("nb"), col("cell").as("cell_b"))
    // same guarded-round predicate as Dedup.embeddingPairs: the cheap
    // raw compare culls candidates, the exact 4-dp check decides
    // (bit-parity with an oracle's round(cos, 4) cut)
    a.join(b,
        col("cell") === col("cell_b") && col("a") < col("b") &&
          pairSim >= threshold - 1e-3 && round(pairSim, 4) >= threshold)
      .select(col("a"), col("b"))
  }

  /** Prototypicality of every vector: its cosine to the centroid of its
    * own k-means cell — the data-pruning metric of Sorscher et al. 2022
    * (arXiv:2206.14486, "Beyond neural scaling laws"): a vector close to
    * its cluster prototype is an "easy"/redundant example, and when data
    * is abundant the best pruning drops the MOST prototypical fraction.
    *
    * Plan shape at 100 TB: the cell assignment is the codegen'd
    * [[graft.functions.NearestCellExpr]] (one scan pass, row-local), the
    * centroid lookup a BROADCAST join on the ≤`nLists`-row centroid
    * table, and the cosine the codegen'd pair kernel — no corpus
    * shuffle at all in this step (the rank window in
    * [[prunePrototypes]] adds the one cell-keyed exchange). The score is
    * rounded to 4 dp (the repo-wide engine-parity grid) and `-0.0` is
    * folded to `+0.0` (IEEE: −0.0 + 0.0 = +0.0) so the value is
    * representation-identical across engines. Null vectors assign a
    * null cell and drop at the join (no geometry, no prototype). */
  def prototypicality(emb: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 16): DataFrame = {
    val idx = Ivf.build(emb, idCol, vecCol, nLists)
    // row-local centroid LOOKUP instead of a centroid-table join: the
    // centroids are already plan constants inside nearest_cell (the
    // NearestCellExpr reference object), so carrying them once more as
    // an array literal adds nothing new to the plan while removing the
    // BroadcastExchange + join entirely — and with it the
    // join-inferred `isnotnull(cell)` that pushed the substituted
    // nearest_cell(...) argmin into the scan filter and evaluated it
    // TWICE per row. (The round-12 left-join + isNotNull(__centroid)
    // attempt was undone by EliminateOuterJoin — a null-intolerant
    // filter on the right side converts a left join back to inner,
    // plans byte-identical; with no join there is nothing to infer
    // from.) The null-vector drop becomes an explicit isnotnull(vec)
    // pushed to the scan — identical rows: a UnaryExpression cell is
    // null iff the vector is, and every non-null cell is 0..k−1 by
    // construction so element_at never misses. cosine() runs against
    // the same float-array values the joined __centroid column carried.
    val centLit = typedLit(idx.centroids.map(_.toSeq).toSeq)
    idx.cells.filter(col(vecCol).isNotNull)
      .select(col(idCol), col("cell"),
        (round(cosine(col(vecCol), element_at(centLit, col("cell") + 1)), 4)
          + lit(0.0)).as("proto"))
  }

  /** Prototypicality pruning: drop the `pruneFrac` most-prototypical
    * members of every cell (rank by `proto` desc, id tie-break; the cut
    * rank is `ceil(pruneFrac · |cell|)` — the same double product both
    * engines evaluate, so the kept set is engine-exact). Keeps
    * (id, cell, proto, rn) for the survivors; `rn` is the within-cell
    * prototypicality rank, so `rn > cut` reads directly as "the hard
    * `1 − pruneFrac` tail of the cell". ONE cell-keyed exchange for the
    * window; cells are size-bounded by the k-means build, so no task
    * sorts more than a cell. */
  def prunePrototypes(emb: DataFrame, idCol: String, vecCol: String,
      pruneFrac: Double, nLists: Int = 16): DataFrame = {
    require(pruneFrac >= 0.0 && pruneFrac < 1.0,
      s"pruneFrac must be in [0, 1), got $pruneFrac")
    val p = prototypicality(emb, idCol, vecCol, nLists)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col("proto").desc, col(idCol).asc)
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
    p.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("rn") > ceil(lit(pruneFrac) * col("__n")).cast("long"))
      .drop("__n")
  }

  /** Top-n most similar pairs (see [[candidatePairs]] for the
    * brute-vs-LSH routing contract). */
  def topPairs(emb: DataFrame, idCol: String, vecCol: String, n: Int,
      maxBrute: Long = 10000L, knownCount: Option[Long] = None): DataFrame = {
    // knownCount may be any UPPER BOUND on the row count — routing only
    // needs to prove the brute pass is affordable
    candidatePairs(emb, idCol, vecCol, maxBrute, knownCount = knownCount)
      .select(col("a"), col("b"), round(pairSim, 4).as("sim"))
      .orderBy(col("sim").desc, col("a"), col("b"))
      .limit(n)
  }
}
