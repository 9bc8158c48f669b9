package graft

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and columnar storage"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "unrelated short text")).toDF("id", "text")

  test("md5 winnowing: same laws as the UDF variant, empty below k") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"), // identical text → identical fps
      (3L, "tiny"),                // shorter than k=5 → no fingerprints
      (4L, "zzz the quick brown fox zzz")) // superstring → shares fps with 1
      .toDF("id", "text")
    val fps = TextAnalysis.winnowMd5Fingerprints(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fps(1L) === fps(2L))
    assert(!fps.contains(3L))
    assert(fps(1L).subsetOf(fps(4L)) || (fps(1L) & fps(4L)).nonEmpty)
    assert(fps(1L).forall(_ >= 0L), "60-bit hashes must stay non-negative")
    // whitespace/case normalization folds into the same fingerprints
    val norm = TextAnalysis.winnowMd5Fingerprints(
        Seq((9L, "THE  quick \n brown   fox")).toDF("id", "text"), "id", "text")
      .collect().map(_.getLong(1)).toSet
    assert(norm === fps(1L))
  }

  test("codegen winnowing matches the declarative md5 chain byte-for-byte") {
    // the WinnowMd5 expression must reproduce the interpreted-HOF chain
    // EXACTLY (same hashes, same window minima, same first-occurrence
    // dedup) — this is what keeps q_doc_winnow's DuckDB oracle valid
    val docs = Seq(
      (1L, "The  Quick\n Brown fox jumps over the lazy dog repeatedly"),
      (2L, "a"), // below k
      (3L, "abcdefg"), // grams but below w windows? 3 grams < w=4 → empty
      (4L, "abcdefgh"), // exactly w grams → one window
      (5L, "ünïcodéŷ characters förever"), // multi-byte chars
      (6L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val fast = TextAnalysis.winnowMd5Fingerprints(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val slow = TextAnalysis.winnowMd5Declarative(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(fast === slow)
    assert(fast.nonEmpty && fast.forall(_._2 >= 0L))
    // and the SQL registration agrees with the column API
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("winnow_docs")
    val viaSql = spark.sql(
      """SELECT id, explode(winnow_md5(
        |  trim(regexp_replace(lower(text), '\\s+', ' ')), 5, 4)) AS fp
        |FROM winnow_docs""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaSql === fast)
  }

  test("corpus-level line dedup strips boilerplate, keeps blanks and order") {
    val docs = Seq(
      (1L, "unique alpha\nCopyright Footer\n\nbody one"),
      (2L, "body two\nCopyright Footer"),
      (3L, "Copyright Footer\nbody three"),
      (4L, "only original content here"),
      (5L, "Copyright Footer")).toDF("id", "text")
    val out = TextAnalysis.stripBoilerplateLines(docs, "id", "text",
        minDocs = 3, maxDocFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // "Copyright Footer" is in 4 of 5 docs (>= max(3, ceil(2.5)) = 3)
    assert(out(1L) === (("unique alpha\n\nbody one", 3L, 1L))) // blank kept
    assert(out(2L) === (("body two", 1L, 1L)))
    assert(out(3L) === (("body three", 1L, 1L)))
    assert(out(4L) === (("only original content here", 1L, 0L)))
    // doc 5 was ALL boilerplate — dropped from the corpus
    assert(!out.contains(5L))
    // raising the threshold past the footer's df keeps everything
    val loose = TextAnalysis.stripBoilerplateLines(docs, "id", "text",
      minDocs = 5, maxDocFrac = 1.0)
    assert(loose.count() === 5)
    assert(loose.agg(sum("lines_dropped")).head.getLong(0) === 0L)
  }

  test("boilerplate gap-path rebuild (lines x flagged above the exists() " +
      "cost bound) matches the small-doc rebuild semantics") {
    // three docs share 2100 boilerplate lines (df 3 >= threshold), so
    // |bpos| = 2100 and lines x flagged > 4e6 routes the rebuild through
    // the sorted-boundary gap slices; unique head/tail lines survive
    val shared = (0 until 2100).map(i => s"boiler line $i").mkString("\n")
    val docs = Seq(
      (1L, s"keep one\n$shared\nkeep two"),
      (2L, s"$shared\nkeep three"),
      (3L, shared)).toDF("id", "text")
    val out = TextAnalysis.stripBoilerplateLines(docs, "id", "text",
        minDocs = 3, maxDocFrac = 1.0)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === (("keep one\nkeep two", 2L, 2100L)))
    assert(out(2L) === (("keep three", 1L, 2100L)))
    assert(!out.contains(3L)) // all boilerplate -> dropped
  }

  test("native text-stat counters match their declarative twins on every edge") {
    // curated edges: empty, all-whitespace (split keeps trailing empties
    // at limit -1), tabs/newlines at edges (trim strips 0x20 only),
    // unicode incl. the Turkish İ lowercase expansion, null, and texts
    // mixing every stopword/punct/digit shape
    val curated = Seq(
      "", " ", "  ", "\t", "\t\t", "\n", " \t ", "a", " a ", "\ta\t",
      "a b", "a  b", "a\tb\nc", "the and of", "The AND Of tHe",
      "İstanbul the city", "ünïcode tök the", "no stop words here?!",
      "1,234.56 -- x; [y] {z} ~`", "0123456789", "a1b2c3",
      "the quick brown fox...", "word", "the", " the", "the ", "\tthe\n",
      null.asInstanceOf[String])
    // pseudo-random sweep over a whitespace/punct/digit/unicode alphabet
    // (deterministic seed — failures must reproduce)
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "ab cd\tthe\nof 0.9!?[]{}~üİ ,;"
    val fuzz = Seq.fill(200)(
      Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = (curated ++ fuzz).toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount(col("text")).as("t"),
      TextAnalysis.stopwordCount(col("text")).as("s"),
      TextAnalysis.punctCount(col("text")).as("p"),
      TextAnalysis.digitCount(col("text")).as("d")).collect()
    val want = df.select(
      TextAnalysis.tokenCountDeclarative(col("text")).as("t"),
      TextAnalysis.stopwordCountDeclarative(col("text")).as("s"),
      TextAnalysis.punctCountDeclarative(col("text")).as("p"),
      TextAnalysis.digitCountDeclarative(col("text")).as("d")).collect()
    for (((g, w), i) <- got.zip(want).zipWithIndex)
      assert(g === w, s"row $i text=${(curated ++ fuzz)(i)}")
    // and non-degenerate: the sweep exercised nonzero counts of each kind
    assert(got.exists(r => !r.isNullAt(0) && r.getInt(0) > 1))
    assert(got.exists(r => !r.isNullAt(1) && r.getInt(1) > 0))
    assert(got.exists(r => !r.isNullAt(2) && r.getInt(2) > 0))
    assert(got.exists(r => !r.isNullAt(3) && r.getInt(3) > 0))
  }

  test("native WordGrams is byte-identical to the declarative chain") {
    // the chain it replaced (TextAnalysis.wordGrams pre-nativization):
    // transform over a 1-based window sequence + array_join + distinct
    def declarative(text: org.apache.spark.sql.Column, n: Int, distinct: Boolean) = {
      val words = TextAnalysis.wsTokens(text)
      val g = transform(sequence(lit(1), size(words) - n + 1),
        i => array_join(slice(words, i, lit(n)), " "))
      when(size(words) >= n, if (distinct) array_distinct(g) else g)
        .otherwise(array().cast("array<string>"))
    }
    val texts = Seq(
      "a b c d e f g h i j", "a a a a a a a a a a", "one two", "", "   ",
      "x", "a  b\tc   d e f g h", "the quick brown fox the quick brown fox the quick",
      "p q r s t u v w", "p q r s t u v w p q r s t u v w").toDF("text")
    for (n <- Seq(1, 2, 8); distinct <- Seq(true, false)) {
      val got = texts.select(TextAnalysis.wordGrams(col("text"), n, distinct).as("g"))
        .collect().map(_.getSeq[String](0)).toSeq
      val want = texts.select(coalesce(declarative(col("text"), n, distinct),
          array().cast("array<string>")).as("g"))
        .collect().map(_.getSeq[String](0)).toSeq
      assert(got === want, s"n=$n distinct=$distinct")
    }
    // null text: empty array, not null (consumers size() it)
    val nullRow = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.wordGrams(col("text"), 2).as("g")).collect()
    assert(nullRow(0).getSeq[String](0) === Seq.empty)
  }

  test("split-norm pair similarity is bit-exact with the fused cosine") {
    // pairSim precomputes each side's norm (sqrt hoisted to the row);
    // the 4-dp-rounded threshold contract only survives if dot/na/nb
    // reproduces the fused loop EXACTLY (same accumulation order, same
    // operation + division order)
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(40)(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("id", "vec")
    val a = df.select(col("id").as("a"), col("vec").as("va"),
      sqrt(graft.functions.DotProduct(col("vec"), col("vec"))).as("na"))
    val b = df.select(col("id").as("b"), col("vec").as("vb"),
      sqrt(graft.functions.DotProduct(col("vec"), col("vec"))).as("nb"))
    val pairs = a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        Similarity.pairSim.as("split"),
        Similarity.cosine(col("va"), col("vb")).as("fused"))
      .collect()
    assert(pairs.length === 40 * 39 / 2)
    for (r <- pairs)
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) diverged")
  }

  test("exact dedup groups identical texts") {
    val groups = Dedup.exact(corpus, "id", "text").collect()
    val dupGroup = groups.find(_.getLong(2) == 2)
    assert(dupGroup.isDefined)
    assert(dupGroup.get.getLong(1) === 1L) // canonical = min id
    assert(groups.length === 4)
  }

  test("keepCanonical keeps exactly the min-id row per content group") {
    val kept = Dedup.keepCanonical(corpus, "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 3L, 5L)) // 4 is an exact dup of 1
  }

  test("minhash LSH surfaces near-dup and exact-dup pairs") {
    val pairs = Dedup.minhashDedup(corpus, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // near-dups
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash verify jaccard == merge-loop reference (column-native parity)") {
    import spark.implicits._
    // reference: the sorted-array linear-merge intersection the former
    // verify UDF computed, applied to the same shingle-hash sets
    def mergeJacc(sa: Seq[Long], sb: Seq[Long]): Double = {
      var i = 0; var j = 0; var inter = 0
      while (i < sa.length && j < sb.length) {
        val c = java.lang.Long.compare(sa(i), sb(j))
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1 else j += 1
      }
      val union = sa.length + sb.length - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }
    val sh = corpus.select(col("id"),
        graft.functions.ShingleHashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = Dedup.minhashDedup(corpus, "id", "text", threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    got.foreach { case ((a, b), jac) =>
      val expect = math.rint(mergeJacc(sh(a), sh(b)) * 1e4) / 1e4
      assert(jac === expect, s"pair ($a,$b)")
    }
    // and the verify path itself is UDF-free
    val plan = Dedup.minhashCandidates(corpus, "id", "text")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("scalaudf"), plan)
  }

  test("packing laws hold across shard counts, incl. the derived default") {
    import spark.implicits._
    val budget = 64L
    val docs = (1L to 120L).map(i => (i, (i * 7 % 90) + 1)).toDF("id", "toks")
    val totalToks = docs.agg(sum("toks")).collect()(0).getLong(0)
    // 0 = derive from spark.sql.shuffle.partitions (4 in this suite)
    for (sh <- Seq(1, 3, 8, 0)) {
      val whole = graft.ops.Packing.packWhole(docs, "id", "toks", budget, sh)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // every document packed exactly once, whole
      assert(whole.map(_._3).sorted.toSeq === (1L to 120L))
      // a bin never exceeds the budget unless it holds one oversized doc
      whole.groupBy(w => (w._1, w._2)).foreach { case (_, rows) =>
        assert(rows.map(_._4).sum <= budget || rows.length == 1)
      }
      val expectShards = if (sh == 0) 4 else sh
      assert(whole.map(_._1).forall(s => s >= 0 && s < expectShards))
      val chunks = graft.ops.Packing.packChunks(docs, "id", "toks", budget, sh)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // token conservation: every token lands in exactly one bin slice
      assert(chunks.map(_._4).sum === totalToks)
      // a chunk bin holds exactly `budget` tokens except a shard's last
      chunks.groupBy(c => (c._1, c._2)).foreach { case ((s, b), rows) =>
        val maxBin = chunks.filter(_._1 == s).map(_._2).max
        if (b < maxBin) assert(rows.map(_._4).sum === budget)
        else assert(rows.map(_._4).sum <= budget)
      }
    }
    intercept[IllegalArgumentException] {
      graft.ops.Packing.packWhole(docs, "id", "toks", budget, -1)
    }
  }

  test("termFrequencies == exploded-groupBy reference (row-local tf parity)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The  quick QUICK fox"),
      (2L, "   "),
      (3L, null.asInstanceOf[String]),
      (4L, "a a a b\tb\nc"),
      (5L, "café CAFÉ x")).toDF("id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = rows(TextAnalysis.termFrequencies(docs, "id", "text"))
    val ref = rows(docs.select(col("id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf")))
    assert(got === ref)
    assert(got.contains((1L, "quick", 2L)))
    assert(!got.exists(_._1 == 2L) && !got.exists(_._1 == 3L))
  }

  test("simhash finds exact dups, excludes unrelated docs") {
    // hamming ≤ 3 only holds for long near-identical docs; on these short
    // ones a single changed token flips many low-margin bits, so only the
    // exact dup is asserted here
    val pairs = Dedup.simhashPairs(corpus, "id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.contains((1L, 5L)))
  }

  test("discrete quantile cut: rank threshold, ties kept, nulls dropped") {
    import graft.ops.Selection
    // n=10, q=0.3 -> k=3 -> threshold = 3rd smallest = 0.2; BOTH 0.2
    // rows stay (>= on a data value, no interpolation)
    val df = Seq(0.1, 0.2, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "score")
    val kept = Selection.keepAboveQuantile(df, "score", 0.3)
      .collect().map(_.getDouble(1)).sorted
    assert(kept.head === 0.2 && kept.length === 9)
    // nulls: never kept, never counted toward n
    val withNull = df.union(Seq((99L, null.asInstanceOf[java.lang.Double]))
      .toDF("id", "score"))
    val kept2 = Selection.keepAboveQuantile(withNull, "score", 0.3)
    assert(kept2.count() === 9 && kept2.filter(col("id") === 99L).isEmpty)
  }

  test("quantile cut: continuous scores past the driver cap take the exact distributed path") {
    import graft.ops.Selection
    // 3000 distinct continuous scores blow a cap of 16 — the range-
    // refinement selection must reproduce the driver-histogram
    // threshold bit-for-bit; heavy-tie case exercises rank counting
    // across bucket boundaries
    val continuous = (1 to 3000).map(i =>
      (i.toLong, math.sin(i.toDouble) * 1000.0 + i / 7.0))
    val ties = (1 to 2000).map(i => (i.toLong, (i % 37).toDouble / 7.0))
    for (scores <- Seq(continuous, ties); q <- Seq(0.1, 0.5, 0.9)) {
      val df = scores.toDF("id", "score")
      val wide = Selection.keepAboveQuantile(df, "score", q)
        .collect().map(_.getLong(0)).sorted.toSeq
      val tight = Selection.keepAboveQuantile(df, "score", q, maxDistinct = 16)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(tight === wide, s"distributed path diverged from driver path at q=$q")
      // naive reference: threshold is the k-th smallest of the sorted
      // multiset (the smallest data value v with #{x <= v} >= k)
      val vals = scores.map(_._2).sorted
      val th = vals(math.ceil(q * vals.length).toInt - 1)
      val expect = scores.filter(_._2 >= th).map(_._1).sorted
      assert(wide === expect, s"driver path diverged from naive rank rule at q=$q")
    }
  }

  test("leakage-safe split: near-dup clusters never straddle the boundary") {
    val universe = (1L to 200L).map(Tuple1(_)).toDF("id")
    // chain 1-2-3 plus pair 10-11: whole components must share a side
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val split = Dedup.splitByCluster(universe, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Set(split(1L), split(2L), split(3L)).size === 1, "chain split apart")
    assert(split(10L) === split(11L), "pair split apart")
    assert(split.values.toSet === Set("val", "train"), "degenerate split")
    // default 64/256 slices: roughly a quarter lands in val
    val valFrac = split.values.count(_ == "val").toDouble / split.size
    assert(valFrac > 0.10 && valFrac < 0.45, s"val fraction $valFrac implausible")
    // deterministic: same inputs, same assignment
    val again = Dedup.splitByCluster(universe, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === split)
  }

  test("asof join: carry-forward, equal-ts match, unmatched nulls, key isolation") {
    import graft.ops.AsOf
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val left = Seq(
      (1L, ts(10), 100L), // after r@5 -> matches 5
      (1L, ts(20), 101L), // equal ts to r@20 -> MUST match 20 (>= rule)
      (1L, ts(3), 102L),  // before any right row -> nulls
      (2L, ts(50), 103L), // other key: only key-2 right rows visible
      (3L, ts(9), 104L)   // key with no right rows at all -> nulls
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts(5), 900L, 0.5), (1L, ts(20), 901L, 0.7), (1L, ts(30), 902L, 0.9),
      (2L, ts(49), 903L, 1.5)
    ).toDF("k", "ts", "rid", "rv")
    val got = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rid", "rv"))
      .collect().map(r => (r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSet
    assert(got === Set(
      (100L, 900L, 0.5), (101L, 901L, 0.7), (102L, -1L, -1.0),
      (103L, 903L, 1.5), (104L, -1L, -1.0)))
    // max-staleness: lid 100's match (ts 5, gap 5 s) dies under a 4 s
    // tolerance; lid 101's equal-ts match (gap 0) and lid 103 (gap 1)
    // survive — staleness reads the ts of the MATCHED row, not any
    // later right row
    val tol = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rid", "rv"),
        toleranceSeconds = Some(4L))
      .collect().map(r => (r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(tol === Set((100L, -1L), (101L, 901L), (102L, -1L),
      (103L, 903L), (104L, -1L)))
  }

  test("range self pairs: bucketed candidates reproduce brute force") {
    import graft.ops.AsOf
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(120) { i =>
      (rnd.nextInt(3).toLong, i.toLong, ts(rnd.nextInt(400).toLong))
    }
    val band = 60L
    val brute = (for {
      (k1, a, t1) <- rows; (k2, b, t2) <- rows
      if k1 == k2
      s1 = t1.getTime / 1000; s2 = t2.getTime / 1000
      if (s2 > s1 && s2 - s1 <= band) || (s2 == s1 && b > a)
    } yield (k1, a, b)).toSet
    val got = AsOf.rangeSelfPairs(rows.toDF("k", "id", "ts"),
        Seq("k"), "ts", "id", band)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    assert(brute.nonEmpty, "band too narrow for the test data")
  }

  test("pca: orthonormal descending basis, whitening, reconstruction, projection parity") {
    import graft.ops.Pca
    // anisotropic deterministic cloud: dim 6, per-dim scales spread two
    // orders of magnitude so the eigen-order is unambiguous
    val rnd = new scala.util.Random(7)
    val scales = Array(10.0, 5.0, 2.0, 1.0, 0.5, 0.1)
    val shift = Array(1.0, -2.0, 0.5, 0.0, 3.0, -1.0)
    val rows = Seq.tabulate(300) { i =>
      (i.toLong, Array.tabulate(6)(j => (rnd.nextGaussian() * scales(j) + shift(j)).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", k = 6)
    // unit, pairwise-orthogonal axes; eigenvalues descending and >= 0
    for (a <- m.basis) assert(math.abs(a.map(x => x * x).sum - 1.0) < 1e-9)
    for (i <- m.basis.indices; j <- (i + 1) until m.basis.length)
      assert(math.abs(m.basis(i).zip(m.basis(j)).map { case (x, y) => x * y }.sum) < 1e-9)
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(m.eigenvalues.forall(_ >= -1e-9))
    // dominant axis aligns with the widest dimension
    assert(math.abs(m.basis(0)(0)) > 0.99)
    // per-component projection variance equals the eigenvalue (same
    // 1/n scaling the covariance uses)
    val proj = Pca.transform(df, "embedding", m, "p")
      .select("p").collect().map(_.getSeq[Double](0).toArray)
    val n = proj.length.toDouble
    for (j <- 0 until 6) {
      val c = proj.map(_(j))
      val mu = c.sum / n
      val v = c.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(v - m.eigenvalues(j)) < 1e-6 * math.max(1.0, m.eigenvalues(j)),
        s"component $j variance $v != eigenvalue ${m.eigenvalues(j)}")
    }
    // full-rank reconstruction: mean + coords . basis restores the input
    val first = rows.head._2.map(_.toDouble).toArray
    val firstProj = proj(0)
    val rec = Array.tabulate(6)(i =>
      m.mean(i) + m.basis.indices.map(j => firstProj(j) * m.basis(j)(i)).sum)
    for (i <- 0 until 6) assert(math.abs(rec(i) - first(i)) < 1e-4)
    // whitened projection has identity covariance
    val mw = Pca.fit(df, "embedding", k = 6, whiten = true)
    val wproj = Pca.transform(df, "embedding", mw, "p")
      .select("p").collect().map(_.getSeq[Double](0).toArray)
    for (i <- 0 until 6; j <- i until 6) {
      val mi = wproj.map(_(i)).sum / n
      val mj = wproj.map(_(j)).sum / n
      val cov = wproj.map(r => (r(i) - mi) * (r(j) - mj)).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov - want) < 1e-6, s"whitened cov($i,$j) = $cov")
    }
    // null vectors: skipped in fit, project to null
    val withNull = df.union(Seq((999L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val m2 = Pca.fit(withNull, "embedding", k = 2)
    // same data (null skipped) but different partitioning → FP sum
    // order differs, so compare loosely
    assert(math.abs(m2.eigenvalues(0) - m.eigenvalues(0)) < 1e-6 * m.eigenvalues(0))
    val nullRow = Pca.transform(withNull, "embedding", m2, "p")
      .filter(col("vec_id") === 999L).select("p").collect()(0)
    assert(nullRow.isNullAt(0))
    // mixed dims ACROSS partitions fail LOUDLY at fit (the element-wise
    // moment merge would silently misalign otherwise) — build the two
    // partitions explicitly so the placement is deterministic
    // repartition(1) on each side: a bare union of local relations
    // collapses to ONE partition and the clamp would hide the mismatch
    val ragged = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding").repartition(1)
      .union(Seq((2L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding").repartition(1))
    intercept[IllegalArgumentException] { Pca.fit(ragged, "embedding", k = 1) }
  }

  test("greedy keep re-admits chain tails that components drop") {
    val universe = (1L to 6L).map(Tuple1(_)).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val greedy = Dedup.greedyKeepFromPairs(universe, "id", pairs)
      .collect().map(_.getLong(0)).toSet
    // 1 admitted; 2 blocked by 1; 3 re-admitted (its only near-dup, 2,
    // was never admitted); 4 admitted; 5 blocked; 6 untouched
    assert(greedy === Set(1L, 3L, 4L, 6L))
    val comp = Dedup.keepFromPairs(universe, "id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(comp === Set(1L, 4L, 6L), "components drop the chain tail")
    // orientation-independent: reversed pair columns normalize to a<b
    val rev = Dedup.greedyKeepFromPairs(universe, "id",
        pairs.select(col("b").as("a"), col("a").as("b")))
      .collect().map(_.getLong(0)).toSet
    assert(rev === greedy)
  }

  test("greedy keep: driver, distributed, and brute walks agree") {
    def brute(n: Long, ps: Seq[(Long, Long)]): Set[Long] = {
      val admitted = scala.collection.mutable.Set.empty[Long]
      (1L to n).foreach { id =>
        if (!ps.exists { case (a, b) => b == id && admitted(a) }) admitted += id
      }
      admitted.toSet
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 25L
      val ps = for {
        a <- 1L to n; b <- (a + 1) to n if rnd.nextDouble() < 0.08
      } yield (a, b)
      val expect = brute(n, ps)
      val u = (1L to n).map(Tuple1(_)).toDF("id")
      val pdf = ps.toDF("a", "b")
      val driver = Dedup.greedyKeepFromPairs(u, "id", pdf)
        .collect().map(_.getLong(0)).toSet
      val dist = Dedup.greedyKeepFromPairs(u, "id", pdf, maxDriverEdges = 0L)
        .collect().map(_.getLong(0)).toSet
      assert(driver === expect, s"driver walk diverged on $ps")
      assert(dist === expect, s"distributed walk diverged on $ps")
    }
    // empty pair list: everything admitted, no jobs wasted on drops
    val u = Seq(Tuple1(7L), Tuple1(8L)).toDF("id")
    assert(Dedup.greedyKeepFromPairs(u, "id",
        spark.emptyDataFrame.select(lit(0L).as("a"), lit(0L).as("b")).limit(0))
      .count() === 2L)
    // a 12-deep chain forces the distributed frontier to propagate one
    // node per round (the worst case for the DAG walk): greedy admits
    // every other node. Also pins the conservative maxRounds over-drop:
    // a too-small round budget must never ADMIT an undecided node.
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("a", "b")
    val cu = (1L to 12L).map(Tuple1(_)).toDF("id")
    val deep = Dedup.greedyKeepFromPairs(cu, "id", chain, maxDriverEdges = 0L)
      .collect().map(_.getLong(0)).toSet
    assert(deep === (1L to 12L by 2).toSet)
    val truncated = Dedup.greedyKeepFromPairs(cu, "id", chain,
        maxDriverEdges = 0L, maxRounds = 3)
      .collect().map(_.getLong(0)).toSet
    assert(truncated.subsetOf(deep), "maxRounds must only ever drop MORE")
    assert((1L to 3L by 2).toSet.subsetOf(truncated), "decided prefix kept")
  }

  test("simhash pigeonhole candidates are lossless vs brute force") {
    // the pair gate's law: chunk-equality candidates + hamming verify
    // must equal a full O(n²) scan at the bound — <= 3 differing bits
    // over 4 16-bit chunks always leaves one chunk identical. Exercised
    // on sketches engineered to straddle the bound: a base value, 1-3
    // bit flips (pairs), 4+ flips spread across all chunks (non-pairs),
    // and flips concentrated in one chunk (pair via the other three).
    import spark.implicits._
    val base = 0x0123456789ABCDEFL
    val sigs: Seq[(Long, Long)] = Seq(
      1L -> base,
      2L -> (base ^ 1L), // 1 bit
      3L -> (base ^ ((1L << 0) | (1L << 20) | (1L << 40))), // 3 bits, 3 chunks
      4L -> (base ^ ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48))), // 4 bits, all chunks
      5L -> (base ^ 0x7L), // 3 bits, one chunk
      6L -> ~base, // 64 bits
      7L -> (base ^ ((1L << 5) | (1L << 6) | (1L << 21) | (1L << 22)))) // 4 bits, 2 chunks
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb))).toSet
    // the engineered sigs go through the SAME pairing machinery the
    // gate uses — no copy of the chunk logic in this test
    val got = Dedup.simhashPairsFromSigs(sigs.toDF("id", "sim"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === brute)
    assert(brute.contains((1L, 2L, 1)) && brute.contains((1L, 5L, 3)))
    assert(!brute.exists(t => t._2 == 4L && t._1 == 1L)) // 4 bits spread: out
    intercept[IllegalArgumentException] {
      Dedup.simhashPairsFromSigs(sigs.toDF("id", "sim"), maxHamming = 4)
    }
  }

  test("token jaccard exact pairs") {
    val pairs = Dedup.tokenJaccardPairs(corpus, "id", "text", 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 4L)) === 1.0)
    // doc2 swaps today->tonight: 11 shared of 13 distinct-union = 0.8462
    assert(pairs((1L, 2L)) === 0.8462)
    assert(!pairs.contains((1L, 3L)))
  }

  test("ngram jaccard is order-sensitive where token jaccard is not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "high jumps fox brown quick the"), // same tokens, reversed order
      (3L, "the quick brown fox jumps far")).toDF("id", "text")
    val tok = Dedup.tokenJaccardPairs(docs, "id", "text", 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(tok((1L, 2L)) === 1.0) // identical token sets
    val tri = Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(!tri.contains((1L, 2L)), "reversed doc shares no 3-gram")
    // docs 1 and 3 share 3 of 5 distinct trigrams: 3/5 = 0.6... wait,
    // each doc has 4 trigrams, shares 3, union 5 -> 0.6
    assert(tri((1L, 3L)) === 0.6)
    // a 2-word doc has no trigrams and never pairs
    val short = Seq((1L, "only two"), (2L, "only two")).toDF("id", "text")
    assert(Dedup.ngramJaccardPairs(short, "id", "text", 3, 0.1).collect().isEmpty)
  }

  test("jaccard prefix filter bounds candidates on a hot-token corpus") {
    // adversarial shape: 200 docs ALL sharing a hot token ('the'), but
    // with otherwise disjoint vocabularies — the naive inverted-index
    // self-join would generate 200·199/2 ≈ 20k candidate pairs off that
    // one token; the prefix filter must keep only true near-dup pairs
    val hot = (0 until 200).map(i =>
      (i.toLong, s"the unique_${i}_a unique_${i}_b unique_${i}_c unique_${i}_d")) ++
      Seq((500L, "the unique_7_a unique_7_b unique_7_c unique_7_x")) // near-dup of 7
    val df = hot.toDF("id", "text")
    val toks = df.select(col("id"),
      explode(array_distinct(split(trim(col("text")), "\\s+"))).as("tok"))
    val nCands = Dedup.jaccardCandidates(toks, 0.5).count()
    assert(nCands < 50, s"prefix filter generated $nCands candidates (quadratic blowup)")
    // and the exact result still finds the planted near-dup: 4 shared of
    // 6 distinct-union = 0.6667
    val pairs = Dedup.tokenJaccardPairs(df, "id", "text", 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((7L, 500L)) === 0.6667)
    assert(pairs.size === 1)
  }

  test("prefix-filtered jaccard equals the naive computation") {
    // lossless-ness check on a mixed corpus: prefix filtering must not
    // drop any pair that reaches the threshold
    val naive = {
      val toks = corpus.select(col("id"),
        explode(array_distinct(split(trim(col("text")), "\\s+"))).as("tok"))
      val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
      toks.as("A").join(toks.as("B"),
          col("A.tok") === col("B.tok") && col("A.id") < col("B.id"))
        .groupBy(col("A.id").as("a"), col("B.id").as("b"))
        .agg(count(lit(1)).as("i"))
        .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn("jaccard",
          round(col("i").cast("double") / (col("sza") + col("szb") - col("i")), 4))
        .filter(col("jaccard") >= 0.3)
        .select("a", "b", "jaccard")
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    }
    val filtered = Dedup.tokenJaccardPairs(corpus, "id", "text", 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(filtered === naive)
  }

  test("topPairs routes large inputs through LSH buckets") {
    def randVec(tag: String): Array[Float] = Array.tabulate(64)(d =>
      (graft.functions.Hash64.hashString(s"$tag:$d").toDouble / Long.MaxValue).toFloat)
    val base = randVec("pair-center")
    def perturb(k: Int): Array[Float] =
      base.zipWithIndex.map { case (v, d) => v + 0.02f * ((k + d) % 3 - 1) }
    val vecs = ((0 until 300).map(i => (i.toLong, randVec(s"p$i"))) ++
      Seq((900L, perturb(1)), (901L, perturb(2)))).toDF("vec_id", "embedding")
    // maxBrute=100 forces the LSH route on this 302-row input; the
    // planted near-identical pair must still win
    val top = Similarity.topPairs(vecs, "vec_id", "embedding", 1, maxBrute = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.head === ((900L, 901L)))
    // the brute route (default cap) agrees
    val brute = Similarity.topPairs(vecs, "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(brute.head === ((900L, 901L)))
  }

  test("LSH top-k achieves high recall vs brute force on clustered data") {
    // a 10-vector cluster of perturbations around vec 7 + 190 random
    // vectors: LSH must keep the cluster findable (sign patterns survive
    // small perturbations); uniform-random corpora have no structure for
    // ANY sublinear index, so that is the honest test shape
    def randVec(tag: String): Array[Float] = Array.tabulate(64)(d =>
      (graft.functions.Hash64.hashString(s"$tag:$d").toDouble / Long.MaxValue).toFloat)
    val base = randVec("cluster-center")
    val vecs = ((0 until 190).map(i => (i.toLong, randVec(s"v$i"))) ++
      (190 until 200).map { i =>
        val noise = randVec(s"noise$i")
        (i.toLong, base.indices.map(d => base(d) + 0.1f * noise(d)).toArray)
      }).toDF("vec_id", "embedding")
    val q = base
    val brute = Similarity.topK(vecs, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(brute === (190L until 200L).toSet) // cluster is the true top-10
    val bucketed = Similarity.buildLsh(vecs, "vec_id", "embedding")
    val approx = Similarity.lshTopK(bucketed, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(approx).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("MinHashSig / SimHash64 / ShingleHashes match the scalar UDF arithmetic they replaced") {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    def h(s: String, seed: Long) =
      XxHash64Function.hash(UTF8String.fromString(s), StringType, seed)
    // independent reimplementation of the former UDF loops
    def shingles(text: String, n: Int): Seq[String] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) Seq(toks.mkString(" "))
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    def refSig(text: String, k: Int, n: Int): Seq[Long] = {
      val sh = shingles(text, n).distinct
      (0 until k).map(i => sh.map(s => h(s, i.toLong)).min)
    }
    def refSim(text: String): Long = {
      val acc = new Array[Int](64)
      for (t <- text.toLowerCase.split("\\s+") if t.nonEmpty; b <- 0 until 64)
        if (((h(t, 0L) >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
      (0 until 64).foldLeft(0L)((o, b) => if (acc(b) > 0) o | (1L << b) else o)
    }
    val texts = Seq("the cat sat on the mat", "ONE two", "  ", "",
      "a b c d e f g a b c", "Unicode tøkens häre von tøkens")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"),
        Dedup.minhashSig(col("text"), 8, 3).as("sig"),
        Dedup.simhash(col("text")).as("sim"),
        graft.functions.ShingleHashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getLong(2), r.getSeq[Long](3)))).toMap
    for ((t, i) <- texts.zipWithIndex) {
      val (sig, sim, sh) = got(i.toLong)
      assert(sig === refSig(t, 8, 3), s"minhash diverged on '$t'")
      assert(sim === refSim(t), s"simhash diverged on '$t'")
      assert(sh === shingles(t, 3).distinct.map(s => h(s, 0L)).sorted, s"shingles diverged on '$t'")
    }
    // null text sketches to NULL (the old zero signature band-collided
    // every null-text doc with every other — O(null-count²) pairs)
    val nr = Seq((0L, null.asInstanceOf[String])).toDF("id", "text")
      .select(Dedup.minhashSig(col("text"), 8, 3), Dedup.simhash(col("text")),
        graft.functions.ShingleHashes(col("text"), 3)).collect()(0)
    assert(nr.isNullAt(0) && nr.isNullAt(1) && nr.isNullAt(2))
  }

  test("SignBucketExpr / NearestCellExpr match the scalar arithmetic they replaced") {
    def randVec(tag: String): Array[Float] = Array.tabulate(64)(d =>
      (graft.functions.Hash64.hashString(s"$tag:$d").toDouble / Long.MaxValue).toFloat)
    val planes = Similarity.hyperplanes(64, 12)
    val cents = Array.tabulate(8)(c => randVec(s"cent$c"))
    // independent scalar reimplementations of the former UDF loops
    def refBucket(v: Array[Float]): Long = {
      var bucket = 0L
      for (p <- planes.indices) {
        var dot = 0.0
        for (i <- 0 until math.min(planes(p).length, v.length)) dot += planes(p)(i) * v(i)
        if (dot >= 0) bucket |= (1L << p)
      }
      bucket
    }
    def refCell(v: Array[Float]): Int = {
      var best = 0; var bd = Double.MaxValue
      for (c <- cents.indices) {
        var d = 0.0
        for (i <- v.indices) { val x = v(i) - cents(c)(i); d += x * x }
        if (d < bd) { bd = d; best = c }
      }
      best
    }
    val vecs = (0 until 50).map(i => (i.toLong, randVec(s"mv$i"))).toDF("vec_id", "embedding")
    val got = vecs.select(col("vec_id"),
        graft.functions.SignBucketExpr(col("embedding"), planes).as("b"),
        graft.functions.NearestCellExpr(col("embedding"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    for (i <- 0 until 50) {
      val v = randVec(s"mv$i")
      assert(got(i.toLong) === ((refBucket(v), refCell(v))), s"vec $i diverged")
    }
    // null vector -> null outputs (the UDF would have NPE'd; the
    // expression is null-safe), and ARRAY<DOUBLE> inputs are accepted
    val withNull = Seq((0L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val nr = withNull.select(
      graft.functions.SignBucketExpr(col("embedding"), planes),
      graft.functions.NearestCellExpr(col("embedding"), cents)).collect()(0)
    assert(nr.isNullAt(0) && nr.isNullAt(1))
    val dbl = Seq((1L, randVec("mv1").map(_.toDouble))).toDF("vec_id", "embedding")
    val dr = dbl.select(graft.functions.SignBucketExpr(col("embedding"), planes))
      .collect()(0).getLong(0)
    // float->double widening of the SAME values changes no sign
    assert(dr === refBucket(randVec("mv1")))
  }

  test("near-dup clusters: connected components with min-id canonicals") {
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {7,9}; singleton 5 absent
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (9L, 7L)).toDF("a", "b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L)
    // driver union-find path (default cap)
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // distributed min-label-propagation fallback (cap forced to 0) must
    // agree exactly
    val dist = Dedup.clusters(pairs, maxDriverEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === expected)
  }

  test("embedding near-dup pairs find the planted pair; keepFromPairs drops the non-canonical") {
    def randVec(tag: String): Array[Float] = Array.tabulate(64)(d =>
      (graft.functions.Hash64.hashString(s"$tag:$d").toDouble / Long.MaxValue).toFloat)
    val base = randVec("nd-center")
    def perturb(k: Int): Array[Float] =
      base.zipWithIndex.map { case (v, d) => v + 0.02f * ((k + d) % 3 - 1) }
    val vecs = ((0 until 50).map(i => (i.toLong, randVec(s"nd$i"))) ++
      Seq((900L, perturb(1)), (901L, perturb(2)))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", threshold = 0.95)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((900L, 901L)))
    // keep: the higher id of the pair is dropped, everything else survives
    val kept = Dedup.keepFromPairs(vecs, "vec_id", pairs)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === ((0L until 50L).toSet + 900L))
    // forcing the LSH route (cap below the row count) still finds the
    // planted pair: near-identical vectors share their sign bucket
    val lsh = Dedup.embeddingPairs(vecs, "vec_id", "embedding",
      threshold = 0.95, maxBrute = 10L)
    assert(lsh.collect().map(r => (r.getLong(0), r.getLong(1))).contains((900L, 901L)))
  }

  test("repetition stats: hand-computed fractions and the keep flag") {
    val docsRep = Seq(
      (1L, "aa aa aa aa"),                 // dup 0.75, top bigram 3/3=1 -> reject
      (2L, "one two three four five six"), // dup 0, bigrams unique 1/5=0.2 -> reject (bigram)
      (3L, "x"),                           // single token: no bigrams, frac 0
      (4L, "alpha beta gamma delta alpha beta gamma delta epsilon zeta " +
        "eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau " +
        "upsilon phi chi psi omega one two")).toDF("id", "text")
    val got = TextAnalysis.repetitionStats(docsRep, "id", "text")
      .orderBy("id").collect()
    assert(got(0).getDouble(2) === 0.75)  // dup_tok_frac of doc 1
    assert(got(0).getDouble(3) === 1.0)   // top_bigram_frac of doc 1
    assert(got(0).getInt(4) === 0)
    assert(got(1).getDouble(2) === 0.0)
    assert(got(2).getDouble(3) === 0.0)   // no bigrams -> 0, not null
    // doc 4: 30 tokens, 26 distinct (alpha..delta each appear twice),
    // top bigram appears twice in 29 slots
    assert(got(3).getDouble(2) === math.rint((1.0 - 26.0 / 30.0) * 1e4) / 1e4)
    assert(got(3).getDouble(3) === math.rint(2.0 / 29.0 * 1e4) / 1e4)
  }

  test("PII redaction: counts and placeholders for email/IP/phone") {
    val pii = Seq(
      (1L, "mail alice@example.org and bob.smith+tag@sub.domain.co now"),
      (2L, "server at 192.168.0.1 or 10.0.3.77, call 555-867-5309"),
      (3L, "clean text with no sensitive content at all"),
      (4L, "dotted phone 123.456.7890 and 1.2.3.4")).toDF("id", "text")
    val got = graft.ops.Redaction.piiStats(pii, "id", "text")
      .orderBy("id").collect()
    assert(got(0).getInt(1) === 2 && got(0).getInt(2) === 0 && got(0).getInt(3) === 0)
    assert(got(0).getString(4) === "mail [EMAIL] and [EMAIL] now")
    assert(got(1).getInt(2) === 2 && got(1).getInt(3) === 1)
    assert(got(1).getString(4) === "server at [IP] or [IP], call [PHONE]")
    assert(got(2).getInt(1) + got(2).getInt(2) + got(2).getInt(3) === 0)
    assert(got(2).getString(4) === "clean text with no sensitive content at all")
    // an IP is not half-claimed by the phone pattern (the IP pass
    // precedes the phone pass)
    assert(got(3).getString(4) === "dotted phone [PHONE] and [IP]")
    // counts are pass-consistent: an IPv4 inside an email host is
    // consumed by the email pass and NOT double-counted as an IP
    val overlap = Seq((1L, "write a@10.0.0.1.com soon")).toDF("id", "text")
    val o = graft.ops.Redaction.piiStats(overlap, "id", "text").collect()(0)
    assert(o.getInt(1) === 1 && o.getInt(2) === 0 && o.getInt(3) === 0)
    assert(o.getString(4) === "write [EMAIL] soon")
  }

  test("chunkSpans: every token covered, overlap = window - stride, last chunk truncated") {
    val text = (1 to 150).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, "short doc only"), (3L, "")).toDF("id", "text")
    val got = TextAnalysis.chunkSpans(df, "id", "text", window = 64, stride = 48)
      .orderBy("id", "chunk_idx").collect()
    val doc1 = got.filter(_.getLong(0) == 1L)
    // n=150: extra=86, ceil(86/48)=2 -> 3 chunks at starts 0, 48, 96
    assert(doc1.map(r => (r.getInt(2), r.getInt(3))).toSeq ===
      Seq((0, 64), (48, 64), (96, 54)))
    assert(doc1(0).getString(4).startsWith("t1 t2 ") &&
      doc1(0).getString(4).endsWith(" t64"))
    assert(doc1(2).getString(4).endsWith(" t150"))
    // short doc: one chunk, whole doc
    val doc2 = got.filter(_.getLong(0) == 2L)
    assert(doc2.length === 1 && doc2(0).getInt(3) === 3 &&
      doc2(0).getString(4) === "short doc only")
    // empty text still yields exactly one (degenerate) chunk
    assert(got.count(_.getLong(0) == 3L) === 1)
  }

  test("stratified sample: exactly k per group, partition-invariant") {
    val rows = (0 until 300).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    val got = graft.ops.Sampling.stratifiedSample(rows, "id", "grp", k = 7)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got.size === 21)
    assert(got.groupBy(_._1).forall(_._2.size == 7))
    val got2 = graft.ops.Sampling.stratifiedSample(rows.repartition(11), "id", "grp", k = 7)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got2 === got)
    // a group smaller than k is kept whole
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    assert(graft.ops.Sampling.stratifiedSample(tiny, "id", "grp", k = 7)
      .count() === 3)
  }

  test("int8 quantization: hand-computed codes, zero-vector safe") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)), // scale 1.0 -> codes 64, -127, 32
      (2L, Array(0.0f, 0.0f, 0.0f)),   // zero vector -> all zeros
      (3L, Array(2.0f))                // single component saturates
    ).toDF("vec_id", "embedding")
    val got = graft.ops.Quantize.int8(vecs, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(got(0).getLong(1) === 1000000L) // scale_e6
    assert(got(0).getLong(2) === (64L - 127L + 32L)) // floor(.5*127+.5)=64
    assert(got(0).getInt(3) === 1)
    assert(got(1).getLong(1) === 0L && got(1).getLong(2) === 0L && got(1).getInt(3) === 0)
    assert(got(2).getLong(2) === 127L && got(2).getInt(3) === 1)
  }

  test("centroids: exact e4 sums per (label, dim)") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f), 0), (2L, Array(3.0f, 5.0f), 0),
      (3L, Array(10.0f, 0.5f), 1)).toDF("vec_id", "embedding", "label")
    val got = graft.ops.Quantize.centroids(vecs, "label", "embedding")
      .orderBy("label", "dim").collect()
    assert(got.map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((0, 1, 40000L, 2L), (0, 2, 70000L, 2L), (1, 1, 100000L, 1L), (1, 2, 5000L, 1L)))
    assert(got(0).getDouble(4) === 2.0) // recovered mean
  }

  test("subtractByContent drops whitespace-normalized content matches") {
    val corpus = Seq((1L, "Keep me around"), (2L, "drop   THIS one"),
      (3L, "also kept")).toDF("id", "text")
    val ref = Seq((10L, "Drop this ONE")).toDF("rid", "rtext")
    val kept = Dedup.subtractByContent(corpus, ref, "text", "rtext")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L))
  }

  test("length histogram buckets docs and token mass") {
    val df = Seq((1L, "a b c"), (2L, (1 to 40).map(_ => "w").mkString(" ")),
      (3L, (1 to 700).map(_ => "w").mkString(" "))).toDF("id", "text")
    val got = TextAnalysis.lengthHistogram(df, "text", bucketSize = 32, maxBucket = 15)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 1L, 3L), (1L, 1L, 40L), (15L, 1L, 700L)))
  }

  test("JSONL source: round-trip, gzip shards, corrupt-line quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docsOut = Seq(
      (1L, "alpha beta", "en", "src0"),
      (2L, "gamma delta", "en", "src1")).toDF("doc_id", "text", "lang", "source")
    graft.ops.Sources.writeJsonlDocs(docsOut, s"$dir/corpus")
    val back = graft.ops.Sources.readJsonlDocs(spark, s"$dir/corpus")
      .orderBy("doc_id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "alpha beta"), (2L, "gamma delta")))
    // quarantine: one good line, one broken line
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "mixed.jsonl"),
      """{"doc_id": 7, "text": "fine", "lang": "en", "source": "s"}
        |{"doc_id": oops not json
        |""".stripMargin)
    val graft.ops.Sources.JsonlSplit(good, rejects, release) =
      graft.ops.Sources.readJsonlDocsWithRejects(spark, s"$dir/mixed.jsonl")
    assert(good.collect().map(_.getLong(0)).toSeq === Seq(7L))
    val rej = rejects.collect().map(_.getString(0))
    assert(rej.length === 1 && rej(0).contains("oops"))
    // the corpus-sized raw cache is caller-releasable (and idempotent)
    release(); release()
  }

  test("budget selection: per-shard greedy prefix, deterministic ties") {
    // one shard so the hand computation is simple: budget 100 / 1 shard
    val scored = Seq(
      (1L, 40L, 0.9), (2L, 50L, 0.8), (3L, 30L, 0.7), (4L, 10L, 0.6))
      .toDF("id", "toks", "score")
    val kept = graft.ops.Selection.selectByBudget(
        scored, "id", "score", "toks", budget = 100L, shards = 1)
      .collect().map(_.getLong(0)).toSet
    // greedy by score: 40 + 50 = 90 fits; +30 would be 120 > 100 ->
    // prefix stops (monotone cumsum also excludes the later 10)
    assert(kept === Set(1L, 2L))
    // sharding: same ids land in fixed shards, each with its own budget
    val sharded = graft.ops.Selection.selectByBudget(
        scored, "id", "score", "toks", budget = 100L, shards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    // shard 0: ids 2 (50), 4 (10); shard 1: ids 1 (40), 3 (30); each 50
    assert(sharded.keySet === Set(2L, 1L))
    assert(sharded(2L) === 50L && sharded(1L) === 40L)
  }

  test("budget selection: remainder spread, column guard, scaled default shards") {
    val scored = Seq(
      (0L, 51L, 0.9), (1L, 50L, 0.9), (2L, 50L, 0.8), (3L, 50L, 0.8))
      .toDF("id", "toks", "score")
    // budget 101 over 2 shards: shard 0 gets 51, shard 1 gets 50 — the
    // budgets sum to the requested 101, so the 51-token doc in shard 0
    // fits (the old floor granted both shards 50 and dropped it)
    val kept = graft.ops.Selection.selectByBudget(
        scored, "id", "score", "toks", budget = 101L, shards = 2)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 1L))
    // one token less and the remainder goes away: shard 0 back to 50
    val tight = graft.ops.Selection.selectByBudget(
        scored, "id", "score", "toks", budget = 100L, shards = 2)
      .collect().map(_.getLong(0)).toSet
    assert(tight === Set(1L))
    // an input already carrying a working column is refused, not
    // silently overwritten
    val clash = scored.withColumn("cum_tokens", lit(0L))
    val err = intercept[IllegalArgumentException] {
      graft.ops.Selection.selectByBudget(
        clash, "id", "score", "toks", budget = 100L, shards = 2)
    }
    assert(err.getMessage.contains("cum_tokens"))
    // shards omitted: derived from the input partitioning (≥ 8), so the
    // default never funnels a large corpus into 8 global sorts
    val wide = scored.repartition(16)
    val auto = graft.ops.Selection.selectByBudget(
      wide, "id", "score", "toks", budget = 1600L)
    assert(auto.select("shard").distinct().count() <= 16)
    assert(auto.collect().map(_.getLong(0)).toSet === Set(0L, 1L, 2L, 3L))
    // a budget below the derived shard count clamps instead of throwing
    // (an explicit shards argument keeps the strict require); nothing
    // fits 1 token/shard here, but the call must not fail on wide inputs
    val tiny = graft.ops.Selection.selectByBudget(
      wide, "id", "score", "toks", budget = 5L)
    assert(tiny.count() === 0L)
  }

  test("cosine expressions read double and mixed-width arrays correctly") {
    // regression: the codegen'd hot loop used getFloat unconditionally,
    // silently mis-reading ARRAY<DOUBLE> slots
    val rows = Seq(
      (1L, Array(1.0, 0.0), Array(1.0, 0.0)),   // identical -> 1.0
      (2L, Array(1.0, 0.0), Array(0.0, 1.0)),   // orthogonal -> 0.0
      (3L, Array(3.0, 4.0), Array(6.0, 8.0)))   // parallel -> 1.0
      .toDF("id", "a", "b")
    val sims = rows.select(col("id"),
        round(Similarity.cosine(col("a"), col("b")), 6).as("sim"))
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(sims === Seq(1.0, 0.0, 1.0))
    // mixed width: float column vs double literal array
    val mixed = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "v")
      .select(round(Similarity.cosine(col("v"),
        lit(Array(1.0, 0.0))), 6)).collect()(0).getDouble(0)
    assert(mixed === 1.0)
    // non-numeric arrays are rejected at analysis time, not mis-read
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Array("x"))).toDF("id", "v")
        .select(Similarity.cosine(col("v"), col("v"))).collect()
    }
  }

  test("dup-span stats: shared spans counted, unique docs at zero") {
    val eight = "one two three four five six seven eight"
    val c = Seq(
      (1L, s"$eight alpha beta gamma"),
      (2L, s"prefix words here then $eight"),
      (3L, "totally different text with no shared span at all anywhere")
    ).toDF("id", "text")
    val got = graft.ops.Decontam.dupSpanStats(c, "id", "text", n = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // docs 1 and 2 share exactly the one 8-gram `eight`; doc 3 shares none
    // doc 1: 11 words -> 4 grams; doc 2: 12 words -> 5 grams; doc 3: 10 -> 3
    assert(got === Seq((1L, 4L, 1L), (2L, 5L, 1L), (3L, 3L, 0L)))
  }

  test("dup-span strip: planted chimera loses the union of overlapping " +
      "spans, fully-covered docs leave the corpus") {
    val eight = "one two three four five six seven eight"
    val c = Seq(
      // 12 words: the chimera below copies words 1-8 AND words 3-12, so
      // coverage is the UNION 1-12 and only the tail survives
      (1L, s"$eight nine ten eleven twelve ka kb"),
      (2L, s"$eight za zb"),                      // copies words 1-8
      (3L, "three four five six seven eight nine ten eleven twelve zc"),
      (4L, eight),                                // fully covered -> dropped
      (5L, "totally different text with no shared span at all anywhere"),
      (6L, ""), (7L, null.asInstanceOf[String])   // tokenless -> absent
    ).toDF("id", "text")
    val got = graft.ops.Decontam.stripDupSpans(c, "id", "text", n = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq(
      (1L, "ka kb", 2L, 12L),
      (2L, "za zb", 2L, 8L),
      (3L, "zc", 1L, 10L),
      (5L, "totally different text with no shared span at all anywhere",
        10L, 0L)))
  }

  test("dup-span strip gap-path rebuild (tokens x starts above the " +
      "exists() cost bound) matches the small-doc rebuild semantics") {
    // two docs share a 2500-token prefix: every prefix gram is
    // duplicated, so |starts| = 2493 and tokens x starts > 4e6 routes
    // the rebuild through the sorted-boundary gap slices instead of the
    // per-token exists() probe; only the unique tails survive
    val prefix = (0 until 2500).map(i => s"w$i").mkString(" ")
    val c = Seq(
      (1L, s"$prefix ua ub uc"),
      (2L, s"$prefix va vb")).toDF("id", "text")
    val got = graft.ops.Decontam.stripDupSpans(c, "id", "text", n = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq(
      (1L, "ua ub uc", 3L, 2500L),
      (2L, "va vb", 2L, 2500L)))
  }

  test("BPE trainer: hand-derived merges in order, early exhaustion, " +
      "segmented vocabulary is the trainer's final state") {
    // words: aa x3, ab x2, b x1. Round 1: pair (a,a) cnt 3 wins; round 2:
    // (a,b) cnt 2; round 3: no pairs left -> exhausted before k = 8
    val docsB = Seq((1L, "aa ab aa"), (2L, "ab aa b")).toDF("id", "text")
    val merges = graft.ops.TextAnalysis.bpeTrainMerges(docsB, "text", merges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(merges === Seq((1L, "a", "a", "aa", 3L), (2L, "a", "b", "ab", 2L)))
    val seg = graft.ops.TextAnalysis.bpeSegmentedVocab(docsB, "text", merges = 8)
      .orderBy("w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(seg === Seq(("aa", 3L, "aa", 1L), ("ab", 2L, "ab", 1L),
      ("b", 1L, "b", 1L)))
  }

  test("BPE doc token counts: learned segmentation summed per doc, OOV " +
      "words count 1, null/empty text counts 0") {
    val train = Seq((1L, "aa ab aa"), (2L, "ab aa b")).toDF("id", "text")
    val seg = graft.ops.TextAnalysis.bpeSegmentedVocab(train, "text", merges = 8)
    // after the two merges every training word is ONE subword
    val apply = Seq((1L, "aa ab aa"), (2L, "ab aa b"),
      (3L, "aa unseenword"), (4L, null.asInstanceOf[String]), (5L, "   "))
      .toDF("id", "text")
    val got = graft.ops.TextAnalysis.bpeDocTokenCounts(apply, seg, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 3L), (2L, 3L), (3L, 2L), (4L, 0L), (5L, 0L)))
    // one training run yields both artifacts consistently
    val (m, s2) = graft.ops.TextAnalysis.bpeTrainArtifacts(train, "text", 8)
    assert(m.count() === 2L && s2.count() === 3L)
  }

  test("BPE trainer: k=40 merges over a 41-char word trains to one token " +
      "(the periodic re-checkpoint keeps round lineage bounded)") {
    // 41 distinct chars that survive the trainer's lower() unchanged
    // (letters + digits cap at 36 distinct; punctuation fills the tail)
    val word = "abcdefghijklmnopqrstuvwxyz0123456789!@#$%"
    assert(word.length === 41 && word.distinct === word &&
      word.toLowerCase === word)
    val docs1 = Seq((1L, word)).toDF("id", "text")
    val merges = graft.ops.TextAnalysis.bpeTrainMerges(docs1, "text", merges = 64)
      .collect()
    assert(merges.length === 40, s"expected 40 merges, got ${merges.length}")
    val seg = graft.ops.TextAnalysis.bpeSegmentedVocab(docs1, "text", merges = 64)
      .collect()
    assert(seg.length === 1 && seg(0).getLong(3) === 1L &&
      seg(0).getString(2) === word)
  }

  test("curation chain: each stage drops exactly its planted victim, " +
      "composition matches the hand-derived keep set") {
    val A = "the quick brown fox jumps over the lazy dog while many " +
      "other animals watch the quiet field today"
    val D = "many animals watch the quick brown fox and the lazy dog " +
      "in the quiet field every day"
    val F = "the contamination sentinel phrase appears exactly here " +
      "once more for the benchmark to catch today"
    val Iplain = "the \"quick\" brown fox rests"
    val H = "the “quick”  brown fox rests"
    val corpusC = Seq(
      (1L, A),                  // survives everything (canonical of {1,2})
      (2L, A),                  // exact dup -> dropped at exact dedup
      (3L, A + " extraterm"),   // near-dup of 1 -> dropped at greedy keep
      (4L, D),                  // survives everything
      (5L, "zzz zzz yyy zzz zzz"), // junk -> dropped at the LR cut
      (6L, F),                  // shares 8-grams with bench -> decontam drop
      (7L, H),                  // normalizes to Iplain -> canonical of {7,8}
      (8L, Iplain),             // normalize-collapsed into 7
      (9L, null.asInstanceOf[String]), // dropped at the door
      (10L, "   ")).toDF("id", "text") // dropped at the door
    val bench = Seq((100L,
      "benchmark doc containing contamination sentinel phrase appears " +
        "exactly here once more for the suite")).toDF("id", "text")
    val labeled = Seq(
      (11L, A, 1), (12L, D, 1), (13L, F, 1), (14L, Iplain, 1),
      (15L, "zzz zzz zzz zzz zzz", 0), (16L, "zzz yyy zzz yyy", 0),
      (17L, "yyy zzz yyy zzz zzz", 0)).toDF("id", "text", "label")
    val model = graft.ops.QualityClassifier.train(
      labeled, "id", "text", "label", iters = 500, lr = 2.0)
    val fin = graft.ops.Curation.curate(corpusC, bench, model, "id", "text")
    val ids = fin.select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 4L, 7L), s"chain kept $ids")
    // the survivor carries the NORMALIZED text (stage 1 rewrites in place)
    val t7 = fin.filter(col("id") === 7).select("text").collect()(0).getString(0)
    assert(t7 === Iplain)
    // injecting a precomputed pair table (the gate's oracle seam) is the
    // same chain as letting curate build its own
    val canon = graft.ops.Curation.normalizedSurvivors(
      corpusC, model, "id", "text")
    val viaSeam = graft.ops.Curation.curateFrom(canon, bench, "id", "text",
        Dedup.minhashDedup(canon, "id", "text", threshold = 0.8))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaSeam === ids)
  }

  test("full curation chain: span-removal strips the planted duplicated " +
      "span from every carrier, DSIR stage accepts/rejects by tau") {
    val A = "the quick brown fox jumps over the lazy dog while many " +
      "other animals watch the quiet field today"
    val S8 = "the quick brown fox jumps over the lazy" // A's first 8 tokens
    val G = "completely novel content about rivers mountains and weather " +
      "patterns in distant lands"
    val F = "the contamination sentinel phrase appears exactly here " +
      "once more for the benchmark to catch today"
    val corpusC = Seq(
      (1L, A),                   // loses its first 8 tokens at span removal
      (2L, A),                   // exact dup -> dropped at exact dedup
      (3L, A + " extraterm"),    // near-dup of 1 -> dropped at greedy keep
      (6L, F),                   // shares 8-grams with bench -> decontam drop
      (20L, S8 + " tailone zqa"), // span twin -> keeps only its tail
      (21L, S8 + " tailtwo zqb"), // span twin -> keeps only its tail
      (30L, G)                   // survives everything untouched
    ).toDF("id", "text")
    val bench = Seq((100L,
      "benchmark doc containing contamination sentinel phrase appears " +
        "exactly here once more for the suite")).toDF("id", "text")
    // an all-positive training set fits a model that keeps every doc —
    // the LR stage is pinned elsewhere; here it must not confound the
    // two NEW stage victims
    val labeled = Seq((11L, "alpha beta", 1), (12L, "gamma delta", 1))
      .toDF("id", "text", "label")
    val model = graft.ops.QualityClassifier.train(
      labeled, "id", "text", "label", iters = 200, lr = 2.0)
    // tau very negative: ln(u) >= ln(2^-32) ≈ -22.18 keeps the accept
    // inequality true for every doc -> the DSIR stage passes everything
    // and the output isolates the span-removal semantics
    val keptAll = graft.ops.Curation.curateFull(corpusC, bench, model,
        "id", "text", tauE4 = -10000000L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keptAll.keySet === Set(1L, 20L, 21L, 30L), s"got ${keptAll.keySet}")
    assert(keptAll(1L) ===
      "dog while many other animals watch the quiet field today")
    assert(keptAll(20L) === "tailone zqa")
    assert(keptAll(21L) === "tailtwo zqb")
    assert(keptAll(30L) === G)
    // tau very positive: round(ln(u)e4) + tau > 0 >= w - mean for some
    // doc is not enough — it must reject ALL; 1e7 dominates any w spread
    val keptNone = graft.ops.Curation.curateFull(corpusC, bench, model,
      "id", "text", tauE4 = 10000000L)
    assert(keptNone.count() === 0L)
    // the staged decomposition is the same chain
    val canon = graft.ops.Curation.normalizedSurvivors(
      corpusC, model, "id", "text")
    val pairs = Dedup.minhashDedup(canon, "id", "text", threshold = 0.8)
    val viaStages = graft.ops.Curation.resampleStage(
        graft.ops.Curation.cleanedStage(canon, bench, "id", "text", pairs),
        bench, "id", "text", tauE4 = -10000000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaStages === keptAll.keySet)
  }

  test("cluster cap: dense cell capped exactly, sparse cell passes whole, " +
      "keep set deterministic") {
    // two tight clusters: 12 vectors near (1,0) and 3 near (0,1) — with
    // nLists = 2 the seeded k-means separates them, so cap = 5 must keep
    // exactly 5 of the dense cell and all 3 of the sparse one
    val vecs = ((1L to 12L).map(i => (i, Array(1f, 0.01f * i))) ++
      (21L to 23L).map(i => (i, Array(0.01f * i, 1f)))).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.capPerCluster(
      vecs, "vec_id", "embedding", nLists = 2, cap = 5)
    val byCell = got.groupBy("cell").count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    assert(byCell.values.toSeq.sorted === Seq(3L, 5L), s"got $byCell")
    // pure function of (corpus, salt): a rerun keeps the same ids
    val ids1 = got.select("vec_id").collect().map(_.getLong(0)).toSet
    val ids2 = graft.ops.Similarity.capPerCluster(
        vecs, "vec_id", "embedding", nLists = 2, cap = 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
  }

  test("quality LR: learns a planted token signal, deterministic fit, " +
      "keepAbove filters by logit") {
    val docs = (1L to 40L).map { i =>
      if (i % 2 == 0) (i, s"good clean prose text number$i", 1)
      else (i, s"bad spam junk noise number$i", 0)
    }
    val df = docs.toDF("id", "text", "label")
    val m = graft.ops.QualityClassifier.train(df, "id", "text", "label",
      buckets = 256)
    val scored = graft.ops.QualityClassifier.score(df, m, "id", "text")
      .select("id", "score_e4").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the planted signal separates: every positive doc above every negative
    for (i <- 1L to 40L)
      if (i % 2 == 0) assert(scored(i) > 0L, s"pos doc $i: ${scored(i)}")
      else assert(scored(i) < 0L, s"neg doc $i: ${scored(i)}")
    // keepAbove at tau=0 keeps exactly the positives
    val kept = graft.ops.QualityClassifier.keepAbove(df, m, "id", "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === (2L to 40L by 2).toSet)
    // the fit is bit-deterministic: same frame, same model
    val m2 = graft.ops.QualityClassifier.train(df, "id", "text", "label",
      buckets = 256)
    assert(m2.biasE8 === m.biasE8 && m2.weightsE8.toSeq === m.weightsE8.toSeq)
    // non-0/1 labels refuse loudly
    intercept[IllegalArgumentException] {
      graft.ops.QualityClassifier.train(
        Seq((1L, "x", 2)).toDF("id", "text", "label"), "id", "text", "label",
        buckets = 256)
    }
    // an existing score_e4 column refuses instead of silently overwriting
    intercept[IllegalArgumentException] {
      graft.ops.QualityClassifier.score(
        df.withColumn("score_e4", lit(1L)), m, "id", "text")
    }
  }

  test("unigram NLL: hand-computed corpus surprisal, rare docs score higher") {
    val c = Seq((1L, "a a a b"), (2L, "a b"), (3L, "z")).toDF("id", "text")
    val got = graft.ops.TextAnalysis.unigramNll(c, "id", "text")
      .orderBy("id").collect()
    // corpus: a×4, b×2, z×1, N=7
    def e4(p: Double) = math.rint(-math.log(p) * 1e4).toLong
    assert(got(0).getLong(1) === 3 * e4(4.0 / 7) + e4(2.0 / 7))
    assert(got(0).getLong(2) === 4L)
    assert(got(2).getLong(1) === e4(1.0 / 7))
    // the hapax doc has the highest per-token surprisal
    val perTok = got.map(r => r.getLong(1).toDouble / r.getLong(2))
    assert(perTok(2) > perTok(0) && perTok(2) > perTok(1))
  }

  test("vocab stats: docs, token mass, types, hapax") {
    val c = Seq((1L, "a a b"), (2L, "b c")).toDF("id", "text")
    val r = graft.ops.TextAnalysis.vocabStats(c, "text").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 5L, 3L, 1L))) // vocab {a,b,c}; hapax {c}
  }

  test("top n-grams: counts and deterministic tie-break") {
    val c = Seq((1L, "x y x y z"), (2L, "x y q")).toDF("id", "text")
    val got = graft.ops.TextAnalysis.topNgrams(c, "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // bigrams: "x y"×3, "y x"×1, "y z"×1, "y q"×1 -> ties by gram asc
    assert(got === Seq(("x y", 3L), ("y q", 1L), ("y x", 1L)))
  }

  test("mixture sampling is deterministic, rate-faithful, and partition-invariant") {
    val rows = (0 until 600).map(i =>
      (i.toLong, if (i % 3 == 0) "keepall" else if (i % 3 == 1) "half" else "none"))
      .toDF("id", "grp")
    val rates = Map("keepall" -> 1.0, "half" -> 0.5, "none" -> 0.0)
    val kept = graft.ops.Sampling.mixtureSample(rows, "id", "grp", rates)
      .collect().map(_.getLong(0)).toSet
    // rate 1.0 keeps everything, 0.0 keeps nothing
    assert((0 until 600 by 3).forall(i => kept.contains(i.toLong)))
    assert((2 until 600 by 3).forall(i => !kept.contains(i.toLong)))
    // rate 0.5 keeps a binomial(200, 0.5) subset
    val halfKept = kept.count(_ % 3 == 1)
    assert(halfKept > 60 && halfKept < 140, s"half-rate kept $halfKept of 200")
    // identical selection on a different partitioning
    val kept2 = graft.ops.Sampling.mixtureSample(rows.repartition(7), "id", "grp", rates)
      .collect().map(_.getLong(0)).toSet
    assert(kept2 === kept)
  }

  test("semDedup: keeps min-id of planted clone pairs; nLists=1 equals global dedup") {
    def randVec(tag: String): Array[Float] = Array.tabulate(32)(d =>
      (graft.functions.Hash64.hashString(s"$tag:$d").toDouble / Long.MaxValue).toFloat)
    // 120 spread vectors + 3 exact clones of vector 5 (ids 500-502)
    val base = (0 until 120).map(i => (i.toLong, randVec(s"sd$i"), i % 3))
    val clones = (500 until 503).map(i => (i.toLong, randVec("sd5"), 99))
    val vecs = (base ++ clones).toDF("vec_id", "embedding", "label")
    val kept = graft.ops.Similarity.semDedupKeep(vecs, "vec_id", "embedding",
        threshold = 0.95, nLists = 4)
      .collect().map(_.getLong(0)).toSet
    // identical vectors land in the same cell by construction, so the
    // clone component must collapse to its min id even cell-scoped
    assert(kept.contains(5L) && !kept.contains(500L) &&
      !kept.contains(501L) && !kept.contains(502L))
    // nLists = 1 degenerates to the EXACT global semantic dedup
    val cellScoped = graft.ops.Similarity.semDedupKeep(vecs, "vec_id", "embedding",
        threshold = 0.8, nLists = 1)
      .collect().map(_.getLong(0)).toSet
    val globalPairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", threshold = 0.8)
    val global = Dedup.keepFromPairs(vecs, "vec_id", globalPairs)
      .collect().map(_.getLong(0)).toSet
    assert(cellScoped === global)
    // nLists = 0 derives the cell count from the corpus size — at 123
    // rows that is one ~2048-row-target cell, i.e. the global dedup
    val derived = graft.ops.Similarity.semDedupKeep(vecs, "vec_id", "embedding",
        threshold = 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(derived === global)
  }

  test("WET reader: conversion records only, Content-Length cut, gz transparent") {
    def conv(uri: String, text: String): String =
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: ${text.getBytes("UTF-8").length}\r\n" +
        s"\r\n$text\r\n\r\n"
    val wet =
      "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n" +
        conv("http://a.example/", "alpha doc body\nwith two lines") +
        "WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: http://skip/\r\n" +
        "Content-Length: 2\r\n\r\nhi\r\n\r\n" +
        conv("http://b.example/", "beta body")
    val dir = java.nio.file.Files.createTempDirectory("graft-wet")
    java.nio.file.Files.write(dir.resolve("part.wet"), wet.getBytes("UTF-8"))
    // gz twin: the text source must decompress transparently
    locally {
      val gz = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(dir.resolve("part2.wet.gz")))
      gz.write(conv("http://c.example/", "gamma gz body").getBytes("UTF-8"))
      gz.close()
    }
    val got = graft.ops.Sources.readWetDocs(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq ===
      Seq("http://a.example/", "http://b.example/", "http://c.example/"))
    assert(got(0)._4 === "alpha doc body\nwith two lines")
    assert(got(1)._4 === "beta body")
    assert(got(2)._4 === "gamma gz body")
    assert(got.forall(_._2 == "2024-01-01T00:00:00Z"))
    assert(got(1)._3 === "beta body".length.toLong)
  }

  test("WET reader: byte-exact multi-byte cut, trailing whitespace kept, early-split drop") {
    def conv(uri: String, text: String): String =
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: ${text.getBytes("UTF-8").length}\r\n" +
        s"\r\n$text\r\n\r\n"
    // CJK + emoji + combining accents: byte length far exceeds char
    // length, so a char-based cut would over-cover by >> the separator
    val cjk = "中文文本 🍕 emoji héllo ἑλλάς"
    // legitimate trailing payload whitespace an rtrim would destroy
    val trail = "doc keeps its trailing whitespace  \t "
    // adversarial payload containing the record separator: the record
    // truncates at the split and the tail fragment (no headers) drops
    val splitty = "prefix kept\r\nWARC/1.0\r\ntail dropped"
    val wet = conv("http://cjk.example/", cjk) +
      conv("http://split.example/", splitty) +
      conv("http://trail.example/", trail)
    val dir = java.nio.file.Files.createTempDirectory("graft-wet-bytes")
    java.nio.file.Files.write(dir.resolve("part.wet"), wet.getBytes("UTF-8"))
    val got = graft.ops.Sources.readWetDocs(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq ===
      Seq("http://cjk.example/", "http://split.example/", "http://trail.example/"))
    // byte-exact round-trip: declared length is the BYTE count and the
    // multi-byte payload comes back identical
    assert(got(0)._2 === cjk.getBytes("UTF-8").length.toLong)
    assert(got(0)._3 === cjk)
    assert(got(2)._3 === trail)
    // the split record yields exactly the bytes before the separator
    // (Content-Length over-declares; the cut takes what is present) and
    // nothing anywhere carries the dropped tail
    assert(got(1)._3 === "prefix kept\r\n")
    assert(!got.exists(_._3.contains("tail dropped")))
  }

  test("corpus diff: added/removed/changed/unchanged by content, null-text safe") {
    import graft.ops.CorpusDiff
    val v1 = Seq((1L, "same"), (2L, "gone"), (3L, "was"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val v2 = Seq((1L, "same"), (3L, "now"), (4L, ""), (5L, "new"))
      .toDF("id", "text")
    val got = CorpusDiff.diff(v1, v2, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // null -> '' reads unchanged: presence defines added/removed, and
    // null text hashes like empty (documented)
    assert(got === Map(1L -> "unchanged", 2L -> "removed",
      3L -> "changed", 4L -> "unchanged", 5L -> "added"))
    val s0 = CorpusDiff.diffSummary(v1, v2, "id", "text").collect()(0)
    assert((s0.getLong(0), s0.getLong(1), s0.getLong(2), s0.getLong(3)) ===
      ((1L, 1L, 1L, 2L)))
  }

  test("contaminationReport attributes hits to specific benchmark items") {
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val corpus = Seq(
      (1L, s"$eight tail tokens here"),
      (2L, "totally different words making another doc entirely okay"),
      (3L, s"prefix $eight")).toDF("id", "text")
    val bench = Seq((100L, eight),
      (200L, "unrelated bench item text pad pad pad pad")).toDF("bid", "text")
    val got = graft.ops.Decontam.contaminationReport(
        corpus, bench, "id", "bid", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 100L, 1L), (3L, 100L, 1L)))
  }

  test("bigramNll: add-one smoothed surprisal matches a naive reference") {
    val rows = Seq(
      (1L, "a b a b c"),
      (2L, "a b"),
      (3L, "x"), // no bigrams -> no row; its token still counts in V
      (4L, "c c c"),
      (5L, "")) // empty text tokenizes to [""]: no row, but "" is in V
    val got = graft.ops.TextAnalysis.bigramNll(rows.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val toks = rows.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val bgs = toks.flatMap { case (id, ws) =>
      ws.sliding(2).filter(_.size == 2).map(p => (id, p.mkString(" "))) }
    val cbg = bgs.groupBy(_._2).map { case (g, l) => g -> l.size.toLong }
    val cu = cbg.groupBy(_._1.split(" ")(0))
      .map { case (w, m) => w -> m.values.sum }
    val v = toks.flatMap(_._2).distinct.size.toLong
    val want = bgs.groupBy(_._1).map { case (id, l) =>
      val nll = l.map { case (_, g) =>
        math.round(-math.log((cbg(g) + 1.0) / (cu(g.split(" ")(0)) + v)) * 10000)
      }.sum
      id -> (nll, l.size.toLong)
    }
    assert(got === want)
    assert(!got.contains(3L), "a one-token doc has no bigrams and no row")
  }

  test("random projection: deterministic, shuffle-free, scale-linear, norm-sane") {
    import graft.ops.Rp
    def fvec(seed: Long) = Array.tabulate(64)(d =>
      ((graft.functions.Hash64.hashString(s"rpv:$seed:$d") % 1000L).toFloat / 500f))
    val vecs = (1L to 40L).map(i => (i, fvec(i)))
    val df = vecs.toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Rp.project(d, "embedding", k = 32, dim = 64)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    val p1 = run(df)
    assert(p1 === run(df.repartition(7)), "projection moved with partitioning")
    // row-local: the projection adds no exchange
    val plan = Rp.project(df, "embedding", k = 32, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"rp projection shuffles:\n$plan")
    // doubling the input doubles the output exactly (dot is linear and
    // 2x is exact in fp)
    val doubled = run(vecs.map { case (i, v) => (i, v.map(_ * 2f)) }
      .toDF("vec_id", "embedding"))
    assert(vecs.forall { case (i, _) =>
      doubled(i).zip(p1(i)).forall { case (d2, d1) => d2 == d1 * 2 } })
    // JL sanity at k=32: projected norm within a broad band of the input
    assert(vecs.forall { case (i, v) =>
      val n0 = math.sqrt(v.map(x => x.toDouble * x).sum)
      val n1 = math.sqrt(p1(i).map(x => x * x).sum)
      n0 == 0 || (n1 / n0 > 0.25 && n1 / n0 < 4.0)
    }, "projected norms left the JL band")
  }

  test("url normalization: case/port/www/slash/fragment rules and the domain heuristic") {
    import graft.ops.Urls
    val rows = Seq(
      (1L, "HTTP://WWW.News.Example.COM:80/A/B/#frag"),
      (2L, "https://api.example.com:443/v1/"),
      (3L, "HTTPS://Example.Com/x?Q=Mixed#s"),
      (4L, "http://localhost:8080/x"),
      (5L, "urn:doc:42"),
      (6L, "HTTP://WWW.News.Example.COM/A/B"), // same page as id 1
      (7L, null.asInstanceOf[String]))
    val got = rows.toDF("id", "url")
      .select(col("id"), Urls.normalizeUrl(col("url")).as("n"),
        Urls.domainOf(Urls.normalizeUrl(col("url"))).as("d"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got(1L)._1 === "http://news.example.com/A/B") // all five rules at once
    assert(got(6L)._1 === got(1L)._1, "rule-differing fetches of one page must collide")
    assert(got(2L)._1 === "https://api.example.com/v1")  // :443 + trailing slash
    assert(got(3L)._1 === "https://example.com/x?Q=Mixed") // query keeps case
    assert(got(4L)._1 === "http://localhost:8080/x")     // non-default port kept
    assert(got(5L)._1 === "urn:doc:42")                  // no authority: fallback
    assert(got(1L)._2 === "example.com" && got(4L)._2 === "localhost"
      && got(5L)._2 === "")
    assert(got(7L)._1 == null)
    // dedup: min id wins per canonical url, multiplicity kept
    val dd = Urls.dedupByUrl(rows.toDF("id", "url"), "id", "url")
      .collect().map(r => (r.getString(1), (r.getLong(0), r.getLong(2)))).toMap
    assert(dd("http://news.example.com/A/B") === (1L, 2L))
    assert(dd("urn:doc:42") === (5L, 1L))
  }

  test("capPerDomain: exact cap, deterministic pick, rerun-stable") {
    import graft.ops.Urls
    val df = (1L to 99L).map(i => (i, s"http://host$i.dom${i % 3}.com/p"))
      .toDF("id", "url")
    val kept = Urls.capPerDomain(df, "id", "url", maxPerDomain = 5)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(kept.length === 15)
    assert(kept.groupBy(_._2).forall(_._2.length == 5))
    // deterministic: same rows on a different partitioning
    val again = Urls.capPerDomain(df.repartition(13), "id", "url", maxPerDomain = 5)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(again.sortBy(_._1).toSeq === kept.sortBy(_._1).toSeq)
    // cap above the domain size keeps everything
    assert(Urls.capPerDomain(df, "id", "url", maxPerDomain = 50).count() === 99L)
  }

  test("packChunksByText equals packChunks over precomputed bpeish counts") {
    val docsDf = (1L to 60L).map(i => (i, ("word " * (i % 9).toInt) + s"tail-$i!"))
      .toDF("id", "text")
    val viaText = graft.ops.Packing.packChunksByText(docsDf, "id", "text",
        budget = 16L, shards = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    val precomputed = docsDf.withColumn("t",
      graft.ops.TextAnalysis.bpeishTokenCount(col("text")))
    val viaCol = graft.ops.Packing.packChunks(precomputed, "id", "t",
        budget = 16L, shards = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(viaText === viaCol)
    assert(viaText.nonEmpty)
  }

  test("planMixture: proportional/uniform/capped water-filling laws") {
    import graft.ops.Sampling.planMixture
    val sizes = Map("web" -> 800L, "books" -> 100L, "code" -> 100L)
    // alpha = 1, ample caps: exactly proportional
    val prop = planMixture(sizes, budget = 500L, alpha = 1.0, maxEpochs = 10.0)
    assert(math.abs(prop("web") - 400.0) < 1e-6 &&
      math.abs(prop("books") - 50.0) < 1e-6 && math.abs(prop("code") - 50.0) < 1e-6)
    // alpha = 0: uniform split across domains
    val uni = planMixture(sizes, budget = 300L, alpha = 0.0, maxEpochs = 10.0)
    assert(uni.values.forall(v => math.abs(v - 100.0) < 1e-6))
    // cap binds: books/code freeze at maxEpochs x size, surplus refills web
    val capped = planMixture(sizes, budget = 1000L, alpha = 0.0, maxEpochs = 2.0)
    assert(math.abs(capped("books") - 200.0) < 1e-6 &&
      math.abs(capped("code") - 200.0) < 1e-6 &&
      math.abs(capped("web") - 600.0) < 1e-6)
    // budget beyond every cap: all domains at cap, total = sum of caps
    val maxed = planMixture(sizes, budget = 100000L, alpha = 0.7, maxEpochs = 2.0)
    assert(math.abs(maxed.values.sum - 2.0 * 1000.0) < 1e-6 &&
      maxed.forall { case (d, v) => math.abs(v - 2.0 * sizes(d)) < 1e-6 })
    // conservation: allocations always sum to min(budget, total cap)
    val some = planMixture(sizes, budget = 700L, alpha = 0.5, maxEpochs = 1.5)
    assert(math.abs(some.values.sum - 700.0) < 1e-6)
    assert(some.forall { case (d, v) => v <= 1.5 * sizes(d) + 1e-6 })
  }

  test("epoch repetition: whole epochs unconditional, fractional Bernoulli, partition-invariant") {
    val rows = (0 until 400).map(i => (i.toLong, i % 4 match {
      case 0 => "x2"; case 1 => "x25"; case 2 => "zero"; case _ => "def"
    })).toDF("id", "grp")
    val eps = Map("x2" -> 2.0, "x25" -> 2.5, "zero" -> 0.0)
    val got = graft.ops.Sampling.epochRepeat(rows, "id", "grp", eps)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val byId = got.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // e = 2.0: exactly epochs 0,1 — no Bernoulli involved
    (0 until 400 by 4).foreach(i => assert(byId(i.toLong) === Seq(0L, 1L)))
    // e = 0.0 drops the group entirely
    (2 until 400 by 4).foreach(i => assert(!byId.contains(i.toLong)))
    // defaultEpochs = 1.0: exactly epoch 0
    (3 until 400 by 4).foreach(i => assert(byId(i.toLong) === Seq(0L)))
    // e = 2.5: contiguous 2 or 3 epochs, third granted ~binomial(100, .5)
    val x25 = (1 until 400 by 4).map(i => byId(i.toLong))
    assert(x25.forall(s => s == Seq(0L, 1L) || s == Seq(0L, 1L, 2L)))
    val third = x25.count(_.size == 3)
    assert(third > 25 && third < 75, s"fractional epoch granted $third of 100")
    // identical plan on a different partitioning
    val got2 = graft.ops.Sampling.epochRepeat(rows.repartition(7), "id", "grp", eps)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got2.toSet === got.toSet)
  }

  test("training shuffle: dense per-shard positions, partition-invariant, null keys dropped") {
    val rows = ((0 until 500).map(i => (Option(i.toLong), s"t$i")) :+
      ((Option.empty[Long], "nokey"))).toDF("id", "txt")
    val got = graft.ops.Shards.trainingShuffle(rows, "id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.length === 500) // the null-key row is dropped
    assert(got.forall { case (_, sh, _) => sh >= 0 && sh < 8 })
    // positions are dense 1..n within every shard
    got.groupBy(_._2).foreach { case (sh, g) =>
      assert(g.map(_._3).sorted.toSeq === (1L to g.length).toSeq, s"shard $sh")
    }
    // the layout is a pure function of (key, salt, nShards)
    val got2 = graft.ops.Shards.trainingShuffle(rows.repartition(11), "id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got2.toSet === got.toSet)
    // physical writer round-trips the exact layout, one dir per shard
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    try {
      graft.ops.Shards.writeShards(rows, "id", nShards = 8, path = dir)
      val back = spark.read.parquet(dir)
        .select(col("id"), col("shard").cast("long"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(back.toSet === got.toSet)
      assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("shard=")) === 8)
    } finally {
      new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively(); ()
    }
  }

  test("IVF top-k achieves high recall vs brute force on clustered data") {
    def randVec(tag: String): Array[Float] = Array.tabulate(64)(d =>
      (graft.functions.Hash64.hashString(s"$tag:$d").toDouble / Long.MaxValue).toFloat)
    val base = randVec("ivf-center")
    val vecs = ((0 until 190).map(i => (i.toLong, randVec(s"iv$i"))) ++
      (190 until 200).map { i =>
        val noise = randVec(s"ivnoise$i")
        (i.toLong, base.indices.map(d => base(d) + 0.1f * noise(d)).toArray)
      }).toDF("vec_id", "embedding")
    val brute = graft.ops.Similarity.topK(vecs, "vec_id", "embedding", base, 10)
      .collect().map(_.getLong(0)).toSet
    val idx = graft.ops.Ivf.build(vecs, "vec_id", "embedding", nLists = 8)
    val approx = graft.ops.Ivf.topK(idx, "vec_id", "embedding", base, 10, nProbe = 2)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(approx).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall too low")
    // the cluster lives in one cell: probing 2 of 8 cells must find it
  }

  test("language id on real-language samples") {
    val samples = Seq(
      (1L, "the cat sat on the mat and it was happy with the result of the day"),
      (2L, "el perro corre en la casa de los vecinos y la plaza del pueblo"),
      (3L, "der Hund läuft durch die Straße und das ist nicht ungewöhnlich von ihm"),
      (4L, "le chat est dans la maison et les enfants jouent dans le jardin pour une heure"),
      (5L, "这是一个中文句子 with some latin")).toDF("id", "text")
    val got = samples.select($"id", TextAnalysis.languageId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "zh"))
  }

  test("quality score favors fluent text over noise") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it is a fine day in the park"),
      (2L, "@@@ ### !!! $$$ %%% ^^^ &&& *** ((()))")).toDF("id", "text")
    val scores = df.select($"id", TextAnalysis.qualityScore($"text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))
    assert(scores(2L) < 0.4)
  }

  test("winnowing fingerprints overlap for near-dups") {
    val fp = TextAnalysis.winnowingUdf(5, 4)
    val rows = corpus.select($"id", fp($"text").as("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val j14 = rows(1L).intersect(rows(4L)).size.toDouble / rows(1L).union(rows(4L)).size
    val j13 = rows(1L).intersect(rows(3L)).size.toDouble / rows(1L).union(rows(3L)).size
    assert(j14 === 1.0) // identical docs -> identical sketch
    assert(j13 < 0.2)
  }

  test("real ImageIO decode: PNG and JPEG headers, stub fallback for garbage") {
    // a real 10×7 PNG, encoded by the JDK itself
    val img = new java.awt.image.BufferedImage(10, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val png = { val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", b); b.toByteArray }
    val mPng = Multimodal.decodeImage(png)
    assert(mPng.format === "png" && mPng.width === 10 && mPng.height === 7)
    assert(mPng.sizeBytes === png.length.toLong)
    val jpg = { val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", b); b.toByteArray }
    val mJpg = Multimodal.decodeImage(jpg)
    assert(mJpg.format === "jpeg" && mJpg.width === 10 && mJpg.height === 7)
    // unrecognized bytes fall back to the deterministic stub
    val garbage = "definitely not an image".getBytes("UTF-8")
    assert(Multimodal.decodeImage(garbage) === Multimodal.decodeImageStub(garbage))
  }

  test("multimodal batch resize re-rasters to target dims (real PNG out)") {
    val media = Multimodal.syntheticMedia(corpus, "id", "text")
    val resized = Multimodal.batchResize(media, targetW = 4, targetH = 4)
      .collect().sortBy(_.id)
    assert(resized.length === 5)
    for (r <- resized) {
      assert(r.meta.width === 4 && r.meta.height === 4)
      assert(r.meta.sizeBytes === r.bytes.length.toLong)
      // the resized bytes ARE a 4×4 image — round-trip through ImageIO
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
      assert(back.getWidth === 4 && back.getHeight === 4)
    }
    // deterministic across runs
    val again = Multimodal.batchResize(media, targetW = 4, targetH = 4)
      .collect().sortBy(_.id)
    assert(resized.map(_.bytes.toSeq).toSeq === again.map(_.bytes.toSeq).toSeq)
  }

  test("multimodal batch featurize reports true decoded metadata") {
    val media = Multimodal.syntheticMedia(corpus, "id", "text")
    val feats = Multimodal.batchFeaturize(media, batchSize = 2).collect()
    assert(feats.length === 5)
    val f1 = feats.find(_.id == 1L).get
    val f4 = feats.find(_.id == 4L).get
    assert(f1.features.toSeq === f4.features.toSeq) // same text -> same image -> same features
    assert(f1.meta === f4.meta)
    assert(f1.meta.format === "png" && f1.meta.sizeBytes > 0)
    // dimensions are the REAL decoded ones, which syntheticPng derives
    // from the text hash in [8, 32)
    assert(f1.meta.width >= 8 && f1.meta.width < 32)
    assert(f1.meta.height >= 8 && f1.meta.height < 32)
    assert(f1.features.length === 64)
  }

  test("mm contract laws: decoded headers equal hash-derived synth params; a swapped payload flips the law") {
    import graft.functions.Hash64
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val feats = Multimodal.batchFeaturize(Multimodal.syntheticMedia(corpus, "id", "text"))
      .collect().map(f => f.id -> f.meta).toMap
    for ((id, m) <- feats) {
      val h = Hash64.hashString(texts(id))
      assert(m.width === 8 + java.lang.Math.floorMod(h, 24L).toInt,
        s"decoded PNG width must round-trip the synth param for doc $id")
      assert(m.height === 8 + java.lang.Math.floorMod(h >>> 8, 24L).toInt)
    }
    val audio = Multimodal.batchAudioFeaturize(
      Multimodal.syntheticAudio(corpus, "id", "text")).collect()
    assert(audio.length === 5)
    for (f <- audio) {
      val h = Hash64.hashString(texts(f.id))
      val n = 400L + java.lang.Math.floorMod(h, 800L)
      assert(f.meta.frames === n)
      assert(f.meta.sampleRate === 8000 && f.meta.channels === 1)
      assert(f.meta.durationMs === (n * 1000.0 / 8000).toLong)
      assert(f.rms.length === 16 && f.rms.forall(v => v >= 0f && v <= 1f))
    }
    // detection: media generated from doc 3's text presented under doc 5's id
    // decodes to doc 3's params, which differ from doc 5's expectation — the
    // per-row equality the contract gates assert catches payload mix-ups
    val swapped = Multimodal.decodeImage(Multimodal.syntheticPng(texts(3L)))
    val h5 = Hash64.hashString(texts(5L))
    assert((swapped.width != 8 + java.lang.Math.floorMod(h5, 24L).toInt) ||
      (swapped.height != 8 + java.lang.Math.floorMod(h5 >>> 8, 24L).toInt))
    val swappedWav = Multimodal.decodeAudio(Multimodal.syntheticWav(texts(3L)))
    assert(swappedWav.frames !== 400L + java.lang.Math.floorMod(h5, 800L))
  }

  test("malformed RIFF chunk sizes fall back instead of crashing the task") {
    // valid RIFF/WAVE magic, then a JUNK chunk declaring a size near
    // Int.MaxValue: the fast-path chunk walk must advance PAST the
    // buffer (Long offset arithmetic) and return None — not wrap the
    // offset negative and throw out of the codec path, which runs
    // outside the JDK fallback's try/catch and would kill the task on
    // one corrupt corpus file
    val b = new Array[Byte](64)
    "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
    "WAVE".getBytes("US-ASCII").copyToArray(b, 8)
    "JUNK".getBytes("US-ASCII").copyToArray(b, 12)
    b(16) = 0xF0.toByte; b(17) = 0xFF.toByte // little-endian 0x7FFFFFF0
    b(18) = 0xFF.toByte; b(19) = 0x7F.toByte
    val meta = Multimodal.decodeAudio(b) // must not throw
    assert(meta.format !== "wav") // fast path refused the bytes
    val rms = Multimodal.audioRms(b) // must not throw either
    assert(rms.length === 16)
  }

  test("keepFromPairs retains null-id rows on the IN-set path like the anti-join") {
    val base = Seq((Option(1L), "a"), (Option(2L), "b"), (Option.empty[Long], "n"))
      .toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    // component {1,2} keeps min-id 1; the null-id row never paired and
    // must survive (NOT IN over null is null — a bare isin filter
    // would silently drop it, diverging from the anti-join fallback)
    val kept = Dedup.keepFromPairs(base, "id", pairs).collect()
    assert(kept.map(_.getString(1)).toSet === Set("a", "n"))
  }

  test("driver-edge caps above Int.MaxValue clamp instead of wrapping") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Dedup.clusters(pairs, maxDriverEdges = Long.MaxValue).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("cluster"))).toSet
    assert(out === Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("a custom MediaEncoder plugs through batchFeaturize's batch contract") {
    import MediaEncoderFixtures._
    val media = Multimodal.syntheticMedia(corpus, "id", "text").coalesce(1)
    val feats = Multimodal.batchFeaturize(media, FakeEncoder(batchSize = 2))
      .collect().sortBy(_.id)
    assert(feats.length === 5)
    // 5 rows on one partition in batches of 2 -> forward passes of 2,2,1
    assert(feats.map(_.features(0)).toSeq === Seq(2f, 2f, 2f, 2f, 1f))
    // every vector came from the fake encoder, not the histogram default
    assert(feats.forall(_.features.length === 2))
    // metadata still flows from the REAL decode, independent of encoder
    assert(feats.forall(_.meta.format == "png"))
    // an encoder violating the one-vector-per-input contract fails loudly
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.batchFeaturize(media, MediaEncoderFixtures.BrokenEncoder()).collect()
    }
    assert(err.getMessage.contains("MediaEncoder returned"))
  }

  test("tf-idf top terms rank the distinctive word first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common zebra"),
      (2L, "common common common"),
      (3L, "common word word")).toDF("doc_id", "text")
    val top = TextAnalysis.topTfidfTerms(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'zebra' and 'word' appear in one doc each (idf ln(3)), 'common' in
    // all three (idf 0) — the distinctive term must win despite lower tf
    assert(top(1L) === "zebra")
    assert(top(3L) === "word")
    // doc 2 has only zero-idf terms; tie-break keeps it deterministic
    assert(top(2L) === "common")
  }

  test("decontamination flags docs sharing n-grams with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text with no overlap here at all"),
      (3L, "we ask what is the capital of france in this prompt"),
      (4L, "short text")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "what is the capital of france"),
      (101L, "the quick brown fox")).toDF("doc_id", "text")
    val hits = graft.ops.Decontam.contaminated(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 1 contains "the quick brown fox" → exactly one distinct 4-gram
    assert(hits(1L) === 1L)
    // doc 3 contains "what is the capital of france" → three 4-grams
    assert(hits(3L) === 3L)
    assert(!hits.contains(2L) && !hits.contains(4L))
    // clean() ships the complement
    val kept = graft.ops.Decontam.clean(corpus, bench, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 4L))
  }

  test("sequence packing: chunk laws hold and layout is deterministic") {
    import spark.implicits._
    val toks = Seq((0L, 100L), (1L, 300L), (2L, 250L), (3L, 700L), (4L, 64L),
      (5L, 0L), (6L, 512L), (7L, 1L)).toDF("doc_id", "toks")
    val packed = graft.ops.Packing.packChunks(toks, "doc_id", "toks",
      budget = 512L, shards = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // law 1: every doc's slices sum to its token count (zero-token docs absent)
    val perDoc = packed.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
    assert(perDoc === Map(0L -> 100L, 1L -> 300L, 2L -> 250L, 3L -> 700L,
      4L -> 64L, 6L -> 512L, 7L -> 1L))
    // law 2: every non-last bin per shard is exactly full
    val perBin = packed.groupBy(p => (p._1, p._2)).view.mapValues(_.map(_._4).sum).toMap
    val lastBin = perBin.keys.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    for (((sh, b), tot) <- perBin if b != lastBin(sh))
      assert(tot === 512L, s"bin ($sh,$b) not full: $tot")
    // law 3: slice offsets are consistent — a doc spanning bins restarts
    // where the previous slice ended
    for ((_, slices) <- packed.groupBy(_._3)) {
      val sorted = slices.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b._5 === a._5 + a._4, s"discontinuous slices for doc ${a._3}")
      }
    }
    // doc 3 (700 tokens, shard 1) must span two sequences
    assert(packed.count(_._3 == 3L) === 2)
  }

  test("whole-document packing: next-fit keeps docs intact within budget") {
    import spark.implicits._
    val toks = Seq((0L, 100L), (2L, 300L), (4L, 250L), (6L, 700L), (8L, 64L),
      (10L, 0L), (12L, 512L), (14L, 1L)).toDF("doc_id", "toks") // all shard 0 (mod 2)
    val packed = graft.ops.Packing.packWhole(toks, "doc_id", "toks",
      budget = 512L, shards = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // each doc appears exactly once (never split); zero-token doc absent
    assert(packed.map(_._3).sorted.toSeq === Seq(0L, 2L, 4L, 6L, 8L, 12L, 14L))
    // next-fit walk in id order at budget 512:
    // 100+300 fit (400); 250 opens bin 1; 700 opens bin 2 (oversize alone);
    // 64 opens bin 3; 512 no longer fits bin 3 → bin 4; 1 fits nothing left → bin 5? no:
    // after 512 fills bin 4 exactly, 1 opens bin 5
    val byDoc = packed.map(p => p._3 -> p._2).toMap
    assert(byDoc === Map(0L -> 0L, 2L -> 0L, 4L -> 1L, 6L -> 2L, 8L -> 3L,
      12L -> 4L, 14L -> 5L))
    // no bin over budget unless it holds a single oversize doc
    for ((bin, docs) <- packed.groupBy(_._2)) {
      val tot = docs.map(_._4).sum
      assert(tot <= 512L || docs.length == 1, s"bin $bin over budget: $tot")
    }
  }

  test("real audio decode: WAV header metadata, stub fallback for garbage") {
    val wav = Multimodal.syntheticWav("hello audio")
    val m = Multimodal.decodeAudio(wav)
    assert(m.format === "wav" && m.sampleRate === 8000 && m.channels === 1)
    assert(m.frames >= 400 && m.frames < 1200) // syntheticWav length range
    // duration from the real frame count at 8 kHz
    assert(m.durationMs === m.frames * 1000 / 8000)
    assert(m.sizeBytes === wav.length.toLong)
    val garbage = "definitely not audio".getBytes("UTF-8")
    assert(Multimodal.decodeAudio(garbage) === Multimodal.decodeAudioStub(garbage))
  }

  test("audio RMS of a known sine is amplitude over sqrt(2)") {
    // hand-build a 16-bit PCM mono WAV: 1 s of a 440 Hz sine, amp 0.5
    val rate = 8000f
    val n = 8000
    val amp = 0.5
    val raw = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * amp * 32767.0).toInt
      raw(i * 2) = (s & 0xFF).toByte
      raw(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val rms = Multimodal.audioRms(bos.toByteArray, windows = 4)
    assert(rms.length === 4)
    val expected = amp / math.sqrt(2)
    for (w <- rms) assert(math.abs(w - expected) < 0.01, s"window rms $w vs $expected")
  }

  test("WAV fast path is bit-identical to the JDK SPI path (mono + stereo + non-WAV fallback)") {
    // mono canonical WAVs across the syntheticWav parameter space
    for (t <- Seq("a", "hello audio", "Zw9", "longer text with words", "")) {
      val wav = Multimodal.syntheticWav(t)
      assert(Multimodal.audioRms(wav, 16).toSeq === Multimodal.audioRmsJdk(wav, 16).toSeq,
        s"mono parity broke for text '$t'")
      assert(Multimodal.audioRms(wav, 3).toSeq === Multimodal.audioRmsJdk(wav, 3).toSeq)
    }
    // hand-built stereo PCM16 WAV: different waves per channel so the
    // channel-mean arithmetic order is actually exercised
    val n = 500
    val raw = new Array[Byte](n * 4)
    for (i <- 0 until n; c <- 0 to 1) {
      val s = (math.sin(2 * math.Pi * (300 + 200 * c) * i / 8000.0) * (0.3 + 0.2 * c) * 32767.0).toInt
      val o = (i * 2 + c) * 2
      raw(o) = (s & 0xFF).toByte
      raw(o + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val stereo = bos.toByteArray
    assert(Multimodal.audioRms(stereo, 8).toSeq === Multimodal.audioRmsJdk(stereo, 8).toSeq)
    // decode fast path reports the same metadata the JDK header parse does
    val meta = Multimodal.decodeAudio(stereo)
    assert(meta.format === "wav" && meta.channels === 2 && meta.frames === n.toLong)
    // a big-endian AIFF declines the fast path and still decodes (JDK SPI)
    val ais2 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw),
      new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, true), n.toLong)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais2,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos2)
    val aiff = bos2.toByteArray
    assert(Multimodal.audioRms(aiff, 4).toSeq === Multimodal.audioRmsJdk(aiff, 4).toSeq)
    assert(Multimodal.audioRms(aiff, 4).exists(_ > 0f))
  }

  test("multimodal batch audio featurize reports true decoded metadata") {
    val media = Multimodal.syntheticAudio(corpus, "id", "text")
    val feats = Multimodal.batchAudioFeaturize(media, batchSize = 2).collect()
    assert(feats.length === 5)
    val f1 = feats.find(_.id == 1L).get
    val f4 = feats.find(_.id == 4L).get
    assert(f1.rms.toSeq === f4.rms.toSeq) // same text -> same wave -> same energy
    assert(f1.meta === f4.meta)
    assert(f1.meta.format === "wav" && f1.meta.sampleRate === 8000)
    assert(f1.rms.length === 16)
    // the sine's per-window energy is amp/√2 and the amp range is [0.2, 0.8)
    assert(f1.rms.forall(w => w > 0.1f && w < 0.6f))
  }
}

/** Encoders for the MediaEncoder seam test — top-level so the Spark
  * closure captures only the (serializable) encoder, never the spec. */
private object MediaEncoderFixtures {
  /** Fake "model": encodes each input as [batchLen, firstByte] — makes
    * both the batching (never more than batchSize per forward pass) and
    * the per-row routing observable in the output. */
  final case class FakeEncoder(override val batchSize: Int)
      extends graft.ops.Multimodal.MediaEncoder {
    val dim = 2
    def encode(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
      batch.map(b => Array(batch.length.toFloat, (b(0) & 0xFF).toFloat))
  }
  /** Violates the one-vector-per-input contract. */
  final case class BrokenEncoder() extends graft.ops.Multimodal.MediaEncoder {
    val dim = 1
    def encode(batch: Seq[Array[Byte]]): Seq[Array[Float]] = Seq.empty
  }
}
