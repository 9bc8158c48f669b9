package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around one shuffle shape that survives scale-up:
  *
  *  - exact: one `groupBy(content hash)` — the canonical map-side-combine
  *    aggregation, no pairwise work;
  *  - MinHash+LSH: per-doc signature (narrow), band-bucket `groupBy`
  *    (shuffle on band hash), pairwise work only WITHIN buckets — the
  *    classic way to keep near-dup detection out of O(n²);
  *  - SimHash: 64-bit sketch, candidate pairs via 16-bit chunk buckets
  *    (pigeonhole: hamming ≤ 3 ⇒ one of 4 chunks equal);
  *  - token-set Jaccard: inverted-index self-join (shuffle on token),
  *    exact but bounded by posting-list sizes — used to verify the
  *    sketch-based candidates;
  *  - embedding cosine: threshold/top-k pairs (brute for verification,
  *    LSH-bucketed in [[Similarity]] as the scale path).
  */
object Dedup {

  /** Exact dedup by content hash: (key, canonical_id, cnt) per group. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("canonical"), count(lit(1)).as("cnt"))

  /** MinHash signature: k minima over seeded XXH64 of the shingle set —
    * one pass per doc, no shuffle. The codegen'd
    * [[graft.functions.MinHashSig]] (identical signatures to the former
    * UDF; null text sketches to null and generates no candidates). */
  def minhashSig(text: Column, k: Int, shingleN: Int): Column =
    graft.functions.MinHashSig(text, k, shingleN)

  /** LSH band table: (id, band, band_hash) — r rows per doc. */
  def minhashBands(sigs: DataFrame, idCol: String, sigCol: String, bands: Int): DataFrame =
    sigs.select(col(idCol).as("id"),
        posexplode(transformBands(col(sigCol), bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

  /** Split a signature array into `bands` slices and hash each slice. */
  private def transformBands(sig: Column, bands: Int): Column = {
    val rows = size(sig) / bands
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(concat_ws(",", transform(slice(sig, b * rows + 1, rows), _.cast("string")))))
  }

  /** Candidate near-dup pairs: docs sharing any LSH band bucket.
    * Pairwise expansion happens only inside buckets. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, shingleN: Int = 3, bands: Int = 16): DataFrame = {
    // bands must tile the signature exactly: bands > k would make every
    // band slice empty (one constant hash → all docs collide pairwise,
    // an O(n²) cross product), and a non-divisor silently drops
    // signature elements, degrading recall with no error
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"bands ($bands) must divide the signature length ($k)")
    val sigs = df.select(col(idCol).as("id"),
      minhashSig(col(textCol), k, shingleN).as("sig"))
    val bandTable = minhashBands(sigs, "id", "sig", bands)
    bandTable.as("A").join(bandTable.as("B"),
        col("A.band") === col("B.band") &&
        col("A.band_hash") === col("B.band_hash") &&
        col("A.id") < col("B.id"))
      .select(col("A.id").as("a"), col("B.id").as("b")).distinct()
  }

  /** MinHash candidates verified with exact token-shingle Jaccard.
    * Shingle sets are computed ONCE per doc and joined to the candidate
    * pairs — a doc appearing in many band-collision pairs must not
    * re-shingle per pair (that turns heavy-vocab corpora quadratic). */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 64, shingleN: Int = 3, bands: Int = 16): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, k, shingleN, bands)
    val docs = df.select(col(idCol).as("jid"),
      graft.functions.ShingleHashes(col(textCol), shingleN).as("sh")).persist()
    try {
      val withSets = cands
        .join(docs.withColumnRenamed("jid", "a").withColumnRenamed("sh", "sa"), "a")
        .join(docs.withColumnRenamed("jid", "b").withColumnRenamed("sh", "sb"), "b")
      withSets.withColumn("jaccard", shingleJaccard(col("sa"), col("sb")))
        .filter(col("jaccard") >= threshold)
        .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
        // materialize the (near-dup-bounded) pair list eagerly so the
        // shingle persist can be released before returning
        .localCheckpoint()
    } finally { docs.unpersist(); () }
  }

  /** The deterministic audit sample behind [[minhashQualityReport]] —
    * factored out so the gate's oracle-aux export builds the candidate
    * table over the IDENTICAL frame (one derivation, both sides; same
    * salted-bucket rule as [[Sampling.mixtureSample]]). */
  private[graft] def auditSample(df: DataFrame, idCol: String,
      sampleRate: Double, salt: String): DataFrame =
    df.filter(Sampling.hashBucket(col(idCol), salt) <
      round(lit(sampleRate) * lit(4294967296.0)).cast("long"))

  /** MinHash parameter audit — EXACT precision/recall of the banded-LSH
    * candidate stage, measured where ground truth is affordable: on a
    * deterministic [[auditSample]], brute all-pairs shingle Jaccard is
    * the truth set and the banded candidates are the system under test.
    * This is the "measure your dedup before trusting it" step a real
    * pipeline runs when tuning (k, bands, threshold): banding is a
    * probabilistic filter whose recall/precision depend on the corpus's
    * similarity distribution, so the numbers must come from data, not
    * from the S-curve formula.
    *
    * ONE row: n_sample, true_pairs (exact ≥ threshold), cand_pairs,
    * true_cand_pairs (candidates that verify), precision_e4 / recall_e4
    * (4-dp fixed point, NULL when the denominator is 0). Cost contract:
    * the quadratic truth pass is BOUNDED by `maxSample` — the sample is
    * probed with `limit(maxSample + 1)` and the operator refuses loudly
    * past the cap (worst case maxSample²/2 shingle intersections,
    * distributed); everything else is the candidate machinery's own
    * band-join cost on a sample-sized corpus. */
  def minhashQualityReport(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, sampleRate: Double = 0.05, salt: String = "mhq",
      maxSample: Int = 4096, k: Int = 64, shingleN: Int = 3,
      bands: Int = 16): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(sampleRate > 0.0 && sampleRate <= 1.0,
      s"sampleRate must be in (0, 1], got $sampleRate")
    require(maxSample >= 2, s"maxSample must be >= 2, got $maxSample")
    val sampled = auditSample(
      df.select(col(idCol), col(textCol)), idCol, sampleRate, salt)
    val probe = sampled.limit(maxSample + 1).count()
    require(probe <= maxSample,
      s"audit sample exceeds $maxSample docs — lower sampleRate (the " +
        "exact truth pass is quadratic in the sample by design)")
    val sh = sampled.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        graft.functions.ShingleHashes(col(textCol), shingleN).as("sh"))
    val ex = sh.select(col("id").as("a"), col("sh").as("sa"))
      .join(sh.select(col("id").as("b"), col("sh").as("sb")), col("a") < col("b"))
      .filter(shingleJaccard(col("sa"), col("sb")) >= threshold)
      .select("a", "b")
    val cands = minhashCandidates(sampled, idCol, textCol, k, shingleN, bands)
    // ONE full-outer join + ONE aggregate for all three pair counts —
    // a cross join of per-set single-row aggregates costs one broadcast
    // build JOB per side (measured: it made this the suite's
    // job-heaviest gate); n_sample rides the probe the cap check
    // already paid
    ex.withColumn("__t", lit(1))
      .join(cands.withColumn("__c", lit(1)), Seq("a", "b"), "full_outer")
      .agg(sum(col("__t")).as("tc"), sum(col("__c")).as("cc"),
        count(when(col("__t").isNotNull && col("__c").isNotNull, 1)).as("bc"))
      .select(lit(probe).as("n_sample"),
        coalesce(col("tc"), lit(0L)).as("true_pairs"),
        coalesce(col("cc"), lit(0L)).as("cand_pairs"),
        col("bc").as("true_cand_pairs"))
      .withColumn("precision_e4", when(col("cand_pairs") === 0, lit(null))
        .otherwise(round(col("true_cand_pairs") * 10000.0 / col("cand_pairs"))
          .cast("long")))
      .withColumn("recall_e4", when(col("true_pairs") === 0, lit(null))
        .otherwise(round(col("true_cand_pairs") * 10000.0 / col("true_pairs"))
          .cast("long")))
  }

  /** Exact Jaccard of two (distinct) shingle-hash SET columns as pure
    * (codegen'd) column ops — no UDF boundary on the verify pass:
    * |A∩B| = size(array_intersect), |A∪B| = |A| + |B| − |A∩B|; two
    * empty sets score 0 like the merge-loop UDF this replaced (parity
    * pinned in OpsSpec). The ONE verify expression shared by
    * [[minhashDedup]] and the streaming ingest twin
    * ([[graft.streaming.Streaming.nearDedupStream]]), so batch and
    * stream verification cannot drift. */
  private[graft] def shingleJaccard(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb))
    val union = size(sa) + size(sb) - inter
    when(union === 0, 0.0).otherwise(inter.cast("double") / union)
  }

  /** 64-bit SimHash of the token multiset — the codegen'd
    * [[graft.functions.SimHash64]] (identical fingerprints to the former
    * UDF; null text sketches to null and joins no candidate pairs). */
  def simhash(text: Column): Column = graft.functions.SimHash64(text)

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (≤ 3):
    * candidates via equal 16-bit chunks (pigeonhole), verified with
    * bit_count(xor). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashPairsFromSigs(
      df.select(col(idCol).as("id"), simhash(col(textCol)).as("sim")), maxHamming)

  /** The pairing half of [[simhashPairs]] over precomputed (id, sim)
    * sketches — the pigeonhole is lossless only while maxHamming < 4
    * (four 16-bit chunks: ≤3 differing bits always leave one chunk
    * identical), so that bound is enforced, not documented. Split out so
    * the losslessness law is testable against a brute-force scan on
    * engineered sketches (OpsSpec) with no copy of the chunk logic. */
  private[graft] def simhashPairsFromSigs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"pigeonhole over 4 chunks is lossless only for maxHamming <= 3, got $maxHamming")
    val chunks = sigs.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    chunks.as("A").join(chunks.as("B"),
        col("A.chunk") === col("B.chunk") &&
        col("A.chunk_val") === col("B.chunk_val") &&
        col("A.id") < col("B.id"))
      .select(col("A.id").as("a"), col("B.id").as("b"),
        expr("bit_count(A.sim ^ B.sim)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Near-dup clusters from a pair list: connected components, returning
    * (id, cluster) where cluster = min id of the component; the cluster
    * id doubles as the canonical (kept) document.
    *
    * Size-conditional execution (the same bounded-driver-materialization
    * pattern as the engine's isin probes and paths walk): a pair list of
    * ≤ `maxDriverEdges` Long-id edges — the common case, since near-dup
    * edges are a vanishing fraction of any corpus — is collected and
    * solved with union-find in microseconds, replacing an O(diameter)
    * sequence of Spark jobs. Larger (or non-Long-keyed) inputs take the
    * distributed iterative min-label propagation (every round one join +
    * one groupBy, lineage cut per round — the standard DataFrame-native
    * union-find for web-scale dedup). */
  /** Driver-side union-find over an (x, y) pair frame when it is
    * long-keyed and under the edge cap: Some(sorted (id, min-label)) or
    * None (caller takes the distributed walk). The cap decision and the
    * edge materialization are ONE bounded job — `limit(cap+1).collect()`
    * sizes the set AND delivers it, and on an over-cap corpus the limit
    * SHORT-CIRCUITS the pair scan at cap+1 rows instead of materializing
    * the whole edge set just to learn it is too big (the old
    * persist+count+collect paid a full materialization plus a second
    * cached-read job either way). The caller's distributed path
    * re-evaluates the pair plan once; that is the already-degraded
    * corpus branch, and the probe it wasted was capped. */
  private def driverComponents(pairs: DataFrame,
      maxDriverEdges: Long): Option[Array[(Long, Long)]] = {
    val isLongKeyed =
      pairs.schema.fields.forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (!isLongKeyed) return None
    // clamp before the Int narrowing: a caller-supplied cap above
    // Int.MaxValue must mean "driver path whenever collectible", not a
    // wrapped (possibly negative) limit
    val cap = math.min(maxDriverEdges, Int.MaxValue - 1L).toInt
    val rows = pairs.limit(cap + 1).collect()
    if (rows.length > cap) return None
    val es = rows.map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx < ry) parent(ry) = rx else if (ry < rx) parent(rx) = ry
    }
    val ids = es.iterator.flatMap { case (x, y) => Iterator(x, y) }.toSet
    Some(ids.toArray.sorted.map(id => (id, find(id))))
  }

  def clusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
      maxRounds: Int = 20, maxDriverEdges: Long = DefaultMaxDriverEdges): DataFrame = {
    val sel = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
    // the common case is ONE bounded job: the capped collect both sizes
    // the edge set and delivers it to the driver union-find
    driverComponents(sel, maxDriverEdges) match {
      case Some(out) =>
        val spark = pairs.sparkSession
        import spark.implicits._
        return out.toSeq.toDF("id", "cluster")
      case None => ()
    }
    // distributed path: materialize the pair plan once with a lineage
    // cut (the iterative walk must not re-run it per round); the input
    // may be an expensive plan (an O(candidates) similarity scan) and
    // the both-directions union below reads it twice
    val p0 = sel.localCheckpoint()
    val edges = p0
      .union(p0.select(col("y").as("x"), col("x").as("y")))
      .distinct().persist()
    var labels = edges.select(col("x").as("id"))
      .union(edges.select(col("y").as("id"))).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val neighborMin = edges
        .join(labels, edges("y") === labels("id"))
        .groupBy(col("x").as("id"))
        .agg(min(col("cluster")).as("ncluster"))
      // carry a `changed` flag through the checkpoint so convergence is a
      // trivial scan of the materialized frame, not an extra join
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("ncluster"), col("cluster"))).as("ncluster"),
          col("cluster"))
        .select(col("id"), col("ncluster").as("cluster"),
          (col("ncluster") =!= col("cluster")).as("changed"))
        .localCheckpoint()
      converged = next.filter(col("changed")).isEmpty
      labels = next.select("id", "cluster")
      round += 1
    }
    edges.unpersist()
    if (!converged)
      // a non-converged label table under-merges: nodes still holding a
      // provisional label look like extra canonicals downstream
      // (keepFromPairs would keep duplicate chains). Surface it loudly —
      // the caller should raise maxRounds past the component diameter.
      System.err.println(
        s"[dedup] clusters() hit maxRounds=$maxRounds before convergence — " +
          "labels are partial; raise maxRounds (components deeper than the " +
          "round count under-merge)")
    labels
  }

  /** Materialize the deduplicated corpus: keep exactly the canonical
    * (min-id) row of every exact-content group. One groupBy + one
    * semi-join — the filter stage that follows [[exact]] in a real
    * pipeline run. */
  def keepCanonical(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val canon = df
      .select(md5(col(textCol)).as("__h"), col(idCol).as("__keep"))
      .groupBy("__h").agg(min("__keep").as("__keep"))
    df.join(canon,
        md5(col(textCol)) === col("__h") && col(idCol) === col("__keep"),
        "left_semi")
  }

  /** Cross-corpus exact subtraction: drop every row of `df` whose
    * normalized content ([[TextAnalysis.fingerprintMd5]]) appears in
    * `reference` — benchmark decontamination / held-out-set removal at
    * the whole-document level (the n-gram-overlap variant is
    * [[Decontam.contaminated]]). One anti-join on the 16-byte
    * fingerprint; the reference side is typically the small one and
    * broadcasts, so a 100 TB corpus pays a single map-side probe. */
  def subtractByContent(df: DataFrame, reference: DataFrame,
      textCol: String, refTextCol: String): DataFrame = {
    val refFp = reference
      .select(TextAnalysis.fingerprintMd5(col(refTextCol)).as("__fp"))
      .distinct()
    df.join(refFp,
        TextAnalysis.fingerprintMd5(col(textCol)) === col("__fp"),
        "left_anti")
  }

  /** Embedding-cosine near-dup pairs: every (a, b, sim) with
    * cosine(a, b) ≥ threshold, a < b. Small corpora (≤ `maxBrute` rows)
    * take the exact all-pairs pass; larger inputs route through
    * sign-projection LSH buckets ([[Similarity.candidatePairs]]) so only
    * same-bucket pairs are scored — approximate above the cap (recall
    * property-tested in OpsSpec), near-linear instead of quadratic. The
    * similarity is rounded to 4 dp BEFORE thresholding so the kept set is
    * reproducible across engines. */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxBrute: Long = 10000L,
      knownCount: Option[Long] = None): DataFrame =
    // threshold inside the join condition AFTER a < b (see
    // candidatePairs: a pushed .filter would lead the conjunction and
    // double the dot-product work); the projection recomputes sim only
    // for the surviving pairs.
    // The exact 4-dp check is GUARDED by a raw-double compare: Spark
    // rounds doubles through BigDecimal (~an allocation + decimal
    // conversion per call), which at n² pairs was the single largest
    // cost of the pass. round(x,4) >= t implies x >= t - 5e-5, so
    // `rawSim >= t - 1e-3` can never reject a pair the exact check
    // accepts — the BigDecimal round now runs only on near-threshold
    // survivors instead of every candidate pair.
    Similarity.candidatePairs(emb, idCol, vecCol, maxBrute,
        pairPred = Some(Similarity.pairSim >= threshold - 1e-3 &&
          round(Similarity.pairSim, 4) >= threshold),
        knownCount = knownCount)
      .select(col("a"), col("b"), round(Similarity.pairSim, 4).as("sim"))

  /** Materialize the near-dup-deduplicated corpus from ANY pair list
    * (MinHash, SimHash, Jaccard, or embedding cosine): connected
    * components over the pair graph (driver union-find under the edge
    * cap, [[clusters]] past it), then keep exactly the min-id member of
    * each component — rows never paired survive untouched (the drop-set
    * IN filter / anti-join only removes paired non-canonicals). */
  def keepFromPairs(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val sel = pairs.select(col("a").as("x"), col("b").as("y"))
    driverComponents(sel, DefaultMaxDriverEdges) match {
      case Some(out) =>
        // the drop set is already driver-local — filter with an IN-set
        // instead of an anti-join: a BroadcastExchange over a
        // LocalRelation still runs a (pointless) collect JOB for the
        // build side, while InSet is a plan-free map-side probe. Large
        // drop sets fall back to the anti-join: a 200k-literal IN would
        // bloat the expression tree every optimizer rule walks.
        val dropIds = out.collect { case (id, c) if c != id => id }
        if (dropIds.isEmpty) df
        else if (dropIds.length <= maxInSetDrop)
          // null-id rows must survive like they do under the anti-join
          // (a null join key never matches): NOT IN over null is null,
          // which a bare filter would drop
          df.filter(col(idCol).isNull || !col(idCol).isin(dropIds.toSeq: _*))
        else {
          val spark = df.sparkSession
          import spark.implicits._
          df.join(dropIds.toSeq.toDF("__drop"),
            df(idCol) === col("__drop"), "left_anti")
        }
      case None =>
        // corpus-scale pair set: distributed component labels (clusters'
        // own capped probe re-fires — wasted but bounded; its checkpoint
        // then materializes the pair plan exactly once for the walk)
        val drop = clusters(sel, "x", "y").filter(col("cluster") =!= col("id"))
          .select(col("id").as("__drop"))
        df.join(drop, df(idCol) === col("__drop"), "left_anti")
    }
  }

  /** Leakage-safe train/val split: every near-dup CLUSTER lands wholly
    * on one side, so a validation document can never have a near-dup
    * in training (the leak a row-wise random split creates whenever
    * the corpus has near-dups — the reason dedup-aware pipelines split
    * by cluster/domain, not by row). Assignment hashes the cluster's
    * canonical id — md5 of the decimal string, first two hex chars
    * compared against `valSlices` (out of 256) — a rule chosen to be
    * bit-reproducible in ANY engine with an md5 function, which is
    * what lets the gate's DuckDB oracle replay the split exactly.
    * Unpaired rows are their own singleton cluster. Adds a `split`
    * column ('val' / 'train'); cost = [[clusters]] + one hash filter. */
  def splitByCluster(df: DataFrame, idCol: String, pairs: DataFrame,
      valSlices: Int = 64, salt: String = "split"): DataFrame = {
    require(valSlices >= 1 && valSlices <= 255,
      s"valSlices must be in [1, 255] (slices of 256), got $valSlices")
    val canon = clusters(pairs).withColumnRenamed("id", "__cid")
    val bound = f"$valSlices%02x"
    val withCluster = df.join(canon, df(idCol) === col("__cid"), "left")
      .withColumn("__cluster",
        coalesce(col("cluster"), col(idCol).cast("long")))
    withCluster
      .withColumn("split",
        when(substring(md5(concat(lit(salt + ":"),
            col("__cluster").cast("string"))), 1, 2) < bound, "val")
          .otherwise("train"))
      .drop("__cid", "cluster", "__cluster")
  }

  /** Greedy FIRST-WINS near-dup admission over a pair list: walk ids
    * ascending and admit an id iff none of its smaller near-dup
    * neighbors was itself ADMITTED. This is ingest-order dedup (the
    * semantics of deduping an unbounded stream, where future edges are
    * unknowable) and differs from [[keepFromPairs]]' connected
    * components on chains: for A~B, B~C with A≁C, components keep only
    * A, while greedy admission keeps A and C — C's one near-dup was
    * never admitted, so dropping C would discard content the kept
    * corpus does not cover. Batch twin of
    * [[graft.streaming.Streaming.nearDedupStream]] (parity pinned in
    * StreamingSpec): ids play the role of arrival order.
    *
    * Same size-conditional execution as [[keepFromPairs]]: one bounded
    * `limit(cap+1)` job collects near-dup edges for a driver walk
    * (exact, microseconds); past the cap, a deterministic frontier
    * propagation over the a<b DAG decides nodes in rounds (round =
    * longest undecided prefix chain — near-dup chains are shallow in
    * practice, and non-convergence warns loudly like [[clusters]]). */
  def greedyKeepFromPairs(df: DataFrame, idCol: String, pairs: DataFrame,
      maxDriverEdges: Long = DefaultMaxDriverEdges, maxRounds: Int = 20): DataFrame = {
    // normalize to a<b (self-pairs carry no information; null ids never
    // join) so the walk's "smaller neighbor" orientation is structural
    val sel = pairs.select(least(col("a"), col("b")).as("x"),
        greatest(col("a"), col("b")).as("y"))
      .filter(col("x") < col("y"))
    val dropped: Either[Array[Long], DataFrame] =
      driverGreedyDrops(sel, maxDriverEdges) match {
        case Some(d) => Left(d)
        case None => Right(distributedGreedyDrops(sel, maxRounds))
      }
    dropped match {
      case Left(dropIds) =>
        if (dropIds.isEmpty) df
        else if (dropIds.length <= maxInSetDrop)
          // same null-row survival rule as keepFromPairs' IN-set path
          df.filter(col(idCol).isNull || !col(idCol).isin(dropIds.toSeq: _*))
        else {
          val spark = df.sparkSession
          import spark.implicits._
          df.join(dropIds.toSeq.toDF("__drop"),
            df(idCol) === col("__drop"), "left_anti")
        }
      case Right(dropDf) =>
        df.join(dropDf, df(idCol) === col("__drop"), "left_anti")
    }
  }

  /** Driver-side exact greedy walk when the edge set is Long-keyed and
    * under the cap (the capped collect both sizes and delivers it). */
  private def driverGreedyDrops(edges: DataFrame,
      maxDriverEdges: Long): Option[Array[Long]] = {
    val isLongKeyed =
      edges.schema.fields.forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (!isLongKeyed) return None
    val cap = math.min(maxDriverEdges, Int.MaxValue - 1L).toInt
    val rows = edges.limit(cap + 1).collect()
    if (rows.length > cap) return None
    val incoming = scala.collection.mutable.LongMap
      .empty[scala.collection.mutable.ArrayBuffer[Long]]
    val ids = scala.collection.mutable.SortedSet.empty[Long]
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      incoming.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
      ids += a; ids += b
    }
    val admitted = scala.collection.mutable.LongMap.empty[Boolean]
    val drops = scala.collection.mutable.ArrayBuffer.empty[Long]
    ids.foreach { id =>
      val ok = incoming.get(id).forall(_.forall(a => !admitted.getOrElse(a, false)))
      admitted(id) = ok
      if (!ok) drops += id
    }
    Some(drops.toArray)
  }

  /** Distributed greedy admission: the a<b orientation makes the pair
    * graph a DAG ordered by id, so statuses propagate in topological
    * frontier rounds — a node is ADMITTED once every smaller neighbor
    * is decided-rejected (or it has none), REJECTED once any smaller
    * neighbor is decided-admitted. Each round is one join + one
    * aggregate with a lineage cut, the same loop shape as [[clusters]].
    * Returns the dropped ids as (__drop). */
  private def distributedGreedyDrops(edgesIn: DataFrame, maxRounds: Int): DataFrame = {
    val edges = edgesIn.localCheckpoint().persist()
    val roots = edges.select(col("x").as("id"))
      .except(edges.select(col("y").as("id")))
    // status: true = admitted, false = rejected; undecided rows absent
    var decided = roots.distinct().withColumn("st", lit(true)).localCheckpoint()
    var undecided = edges.select(col("y").as("id")).distinct().localCheckpoint()
    var round = 0
    while (!undecided.isEmpty && round < maxRounds) {
      // per undecided target: any admitted smaller neighbor → rejected;
      // all smaller neighbors decided-rejected → admitted; else wait
      val in = edges.join(undecided, edges("y") === undecided("id"))
        .join(decided.withColumnRenamed("id", "xid").withColumnRenamed("st", "xst"),
          col("x") === col("xid"), "left")
      val resolved = in.groupBy(col("y").as("id"))
        .agg(max(when(col("xst") === true, 1).otherwise(0)).as("anyAdm"),
          min(when(col("xst").isNull, 0).otherwise(1)).as("allDec"))
        .filter(col("anyAdm") === 1 || col("allDec") === 1)
        .select(col("id"), (col("anyAdm") === 0).as("st"))
        .localCheckpoint()
      if (resolved.isEmpty) round = maxRounds // no progress: bail loudly below
      else {
        decided = decided.union(resolved.select("id", "st")).localCheckpoint()
        undecided = undecided.join(resolved, Seq("id"), "left_anti").localCheckpoint()
        round += 1
      }
    }
    if (!undecided.isEmpty)
      // an undecided node downstream defaults to DROPPED here — the
      // conservative direction for dedup (never emits a near-dup pair
      // into the kept corpus), but it over-drops: raise maxRounds past
      // the longest near-dup prefix chain
      System.err.println(
        s"[dedup] greedyKeepFromPairs hit maxRounds=$maxRounds with " +
          "undecided chain nodes — they are dropped conservatively; " +
          "raise maxRounds past the deepest near-dup chain")
    val out = decided.filter(!col("st")).select(col("id").as("__drop"))
      .union(undecided.select(col("id").as("__drop"))).distinct()
    edges.unpersist()
    out
  }

  /** Driver-local drop sets up to this size filter via IN-set (no join,
    * no broadcast-build job); larger ones anti-join a local relation. */
  private val maxInSetDrop = 20000

  /** One cap for every driver-union-find routing probe ([[clusters]] and
    * [[keepFromPairs]] must take the same path for the same pair set). */
  private val DefaultMaxDriverEdges = 200000L

  /** Token streams (id, tok) for Jaccard: distinct whitespace tokens. */
  private def jaccardToks(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(split(trim(col(textCol)), "\\s+"))).as("tok"))

  /** Candidate pairs via POSITIONAL PREFIX FILTERING (the standard
    * all-pairs guard against hot-token blowup): order every doc's tokens
    * by global document frequency ascending, and only the first
    * `|A| - ⌈t'·|A|⌉ + 1` rarest tokens of each doc generate join rows.
    * If J(A,B) ≥ t then |A∩B| ≥ t·|A| and the prefixes must intersect, so
    * the filter is LOSSLESS for the threshold — while a stopword shared
    * by k docs no longer creates k² candidates, because a high-df token
    * almost never lands in a prefix. `t'` is slackened by 1e-4 so pairs
    * whose 4-dp-rounded Jaccard reaches t also survive. */
  private[graft] def jaccardCandidates(toks: DataFrame, threshold: Double): DataFrame = {
    // standalone use (tests, ad-hoc candidate inspection): materialize so
    // the prefix persist can be released before returning
    val prefix = prefixOf(rankedToks(toks), threshold).persist()
    val cands = candidatesFromPrefix(prefix)
    try cands.localCheckpoint() finally { prefix.unpersist(); () }
  }

  /** (id, tok, rank, sz): the shared substrate of the prefix filter AND
    * the exact intersection — every token row carries its doc's size and
    * its ascending-global-df rank. The df count stays a `groupBy(tok)`
    * + join (NOT a count window over `partitionBy(tok)`: the groupBy
    * partial-aggregates map-side, while a tok-partitioned window would
    * funnel every occurrence of a hot stopword through one task at
    * corpus scale). The two per-id windows (size + rank) share one
    * exchange. */
  private def rankedToks(toks: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfCounts = toks.groupBy("tok").agg(count(lit(1)).as("tokdf"))
    toks.join(dfCounts, "tok")
      .withColumn("rank", row_number().over(
        Window.partitionBy("id").orderBy(col("tokdf").asc, col("tok").asc)))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("id")))
      .select("id", "tok", "rank", "sz")
  }

  /** The lossless candidate-generating prefix: the `|A| − ⌈t'·|A|⌉ + 1`
    * rarest tokens of each doc (see [[jaccardCandidates]]). */
  private def prefixOf(ranked: DataFrame, threshold: Double): DataFrame = {
    val tp = threshold - 1e-4
    ranked.filter(col("rank") <= col("sz") - ceil(lit(tp) * col("sz")) + 1)
      .select("id", "tok")
  }

  private def candidatesFromPrefix(prefix: DataFrame): DataFrame =
    prefix.as("A").join(prefix.as("B"),
        col("A.tok") === col("B.tok") && col("A.id") < col("B.id"))
      .select(col("A.id").as("a"), col("B.id").as("b"))
      .distinct()

  /** Shared Jaccard tail over any (id, tok) element stream: prefix-filter
    * candidates, exact intersection on candidates only, similarity ≥
    * threshold.
    *
    * The (id, tok, rank, sz) substrate feeds the prefix and BOTH
    * intersection sides as ONE canonical subplan: its window exchange
    * (hashpartitioning(id)) and the df-count broadcast are identical in
    * every use, so ReuseExchange serves the second and third
    * evaluations from the first's shuffle/broadcast output — no
    * persist, no checkpoint, no extra materialization job. (The former
    * persist + terminal localCheckpoint bought the same sharing for two
    * extra actions and a block-manager round-trip per call: 6 Spark
    * jobs per gate evaluation vs 1–3 for the lazy plan, and the
    * persisted blocks churned neighbors' cached substrates out of the
    * store. At cluster scale AQE performs the same exchange reuse.) */
  private def jaccardPairsFromToks(toksRaw: DataFrame, threshold: Double): DataFrame =
    jaccardTail(rankedToks(toksRaw), threshold)

  /** Candidate generation + exact intersection + threshold over a
    * ranked substrate — the lazy plan behind [[jaccardPairsFromToks]],
    * factored out so the plan contract can pin the join shape the
    * checkpointed execution path hides. */
  private def jaccardTail(ranked: DataFrame, threshold: Double): DataFrame =
    candidatesFromPrefix(prefixOf(ranked, threshold))
      .join(ranked.as("TA"), col("a") === col("TA.id"))
      .join(ranked.as("TB"), col("b") === col("TB.id") && col("TA.tok") === col("TB.tok"))
      .groupBy(col("a"), col("b"))
      // all rows of a group share one (sza, szb) — first() carries the
      // sizes through the count without re-joining them
      .agg(count(lit(1)).as("i"),
        first(col("TA.sz")).as("sza"), first(col("TB.sz")).as("szb"))
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("sza") + col("szb") - col("i")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")

  /** The UNMATERIALIZED token-Jaccard pair plan (no persist, no
    * checkpoint) — plan-contract inspection only; execution goes
    * through [[tokenJaccardPairs]]. */
  private[graft] def tokenJaccardPlanOnly(df: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame =
    jaccardTail(rankedToks(jaccardToks(df, idCol, textCol)), threshold)

  /** Exact token-set Jaccard pairs — (a, b, jaccard) for pairs ≥
    * threshold. Candidates come from the prefix filter (lossless, see
    * [[jaccardCandidates]]); the exact intersection is then computed only
    * for candidate pairs, so cost scales with true near-duplicates, not
    * with the square of the hottest token's document frequency. */
  def tokenJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame =
    jaccardPairsFromToks(jaccardToks(df, idCol, textCol), threshold)

  /** Exact word-n-gram Jaccard pairs: the element set is the distinct
    * n-word shingles, so ORDER matters — documents sharing vocabulary but
    * not phrasing score near zero, unlike [[tokenJaccardPairs]]. Docs
    * shorter than n words have no shingles and join no pairs. Same
    * prefix-filtered machinery. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val toks = df.select(col(idCol).as("id"),
      explode(TextAnalysis.wordGrams(col(textCol), n)).as("tok"))
    jaccardPairsFromToks(toks, threshold)
  }
}
