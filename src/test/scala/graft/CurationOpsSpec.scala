package graft

import graft.ops.{Selection, Shards, Similarity, TextAnalysis, Urls}
import org.apache.spark.sql.functions._

/** Round-9 curation operators: BPE pair counting, CCNet score buckets,
  * shard manifests, domain blocklists, prototypicality pruning. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bpe pair counts: frequency-weighted over the vocabulary") {
    val df = Seq((1L, "ab ab abc"), (2L, "ab b")).toDF("id", "text")
    // vocab: ab→3, abc→1, b→1 (no pair); pairs: 'ab' from ab(3)+abc(1)=4,
    // 'bc' from abc(1)
    val rows = TextAnalysis.bpePairCounts(df, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("ab", 4L), ("bc", 1L)))
  }

  test("bpe pair counts: case folds, count-desc pair-asc order") {
    val df = Seq((1L, "AB xy"), (2L, "xy")).toDF("id", "text")
    val rows = TextAnalysis.bpePairCounts(df, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("xy", 2L), ("ab", 1L)))
  }

  test("score buckets: per-group tertile cuts, id tie-break") {
    val df = Seq(
      ("en", 1L, 1.0), ("en", 2L, 2.0), ("en", 3L, 3.0), ("en", 4L, 4.0),
      ("de", 5L, 9.0),
      ("fr", 6L, 1.0), ("fr", 7L, 1.0) // tied scores → id order decides
    ).toDF("lang", "id", "s")
    val out = Selection.scoreBuckets(df, "lang", "s", "id")
      .collect().map(r => (r.getLong(1), r.getString(3))).toMap
    // n=4: head through ceil(4/3)=2, middle through ceil(8/3)=3
    assert(out(1L) === "head" && out(2L) === "head")
    assert(out(3L) === "middle" && out(4L) === "tail")
    // singleton group is all head
    assert(out(5L) === "head")
    // n=2: ceil(2/3)=1 head, ceil(4/3)=2 middle, no tail
    assert(out(6L) === "head" && out(7L) === "middle")
  }

  test("shard manifest: order-invariant, dense, content-sensitive") {
    val docs = (0L until 40L).map(i => (i, s"text body $i")).toDF("doc_id", "text")
    val m1 = Shards.manifest(Shards.trainingShuffle(docs, "doc_id", 4),
      "doc_id", "text").orderBy("shard").collect()
    assert(m1.map(_.getLong(1)).sum === 40L)
    // dense positions: max_pos == n_docs in every shard
    m1.foreach(r => assert(r.getLong(3) === r.getLong(1)))
    // the same corpus in any order / partitioning manifests identically
    val m2 = Shards.manifest(
      Shards.trainingShuffle(docs.orderBy(rand(7)).repartition(7), "doc_id", 4),
      "doc_id", "text").orderBy("shard").collect()
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    // one flipped document changes a checksum but no count
    val tweaked = docs.withColumn("text",
      when(col("doc_id") === 0L, lit("TEXT BODY 0")).otherwise(col("text")))
    val m3 = Shards.manifest(Shards.trainingShuffle(tweaked, "doc_id", 4),
      "doc_id", "text").orderBy("shard").collect()
    assert(m1.map(_.getDecimal(4)).toSeq !== m3.map(_.getDecimal(4)).toSeq)
    assert(m1.map(_.getLong(1)).toSeq === m3.map(_.getLong(1)).toSeq)
  }

  test("blocklist: suffix blocks subdomains, exact host, keeps siblings") {
    val df = Seq(
      (1L, "http://ads.example.com/x"), // subdomain of a blocked domain
      (2L, "http://example.com/y"), // the blocked domain itself
      (3L, "http://example.com.evil.org/z"), // suffix trap — NOT blocked
      (4L, "https://WWW.Sub.Tracker.NET/a"), // blocked after normalization
      (5L, "http://good.org/b"),
      (6L, "urn:isbn:12345"), // no authority → kept
      (7L, null.asInstanceOf[String]) // null url → kept
    ).toDF("id", "url")
    val kept = Urls.filterBlockedDomains(df, "url",
        Seq("example.com", "Tracker.NET"))
      .select("id").as[Long].collect().toSet
    assert(kept === Set(3L, 5L, 6L, 7L))
  }

  test("normalizeText: every rule fires, order holds, idempotent") {
    val df = Seq(
      (1L, "a\u0007b"), // control char removed, NOT collapsed to space
      (2L, "\u201Cq\u201D \u2018y\u2019"), // curly -> straight quotes
      (3L, "a \u2013 b \u2014 c"), // dashes -> hyphen
      (4L, "a\u00A0b\u3000c"), // unicode spaces -> plain space
      (5L, "  a\t\tb  \n c  "), // collapse + trim
      (6L, "x\u0007 \u0007y") // removal happens BEFORE collapse
    ).toDF("id", "text")
    val out = df.select(col("id"),
        graft.ops.TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "ab")
    assert(out(2L) === "\"q\" 'y'")
    assert(out(3L) === "a - b - c")
    assert(out(4L) === "a b c")
    assert(out(5L) === "a b c")
    assert(out(6L) === "x y")
    // idempotence: a normalized string is its own fixpoint
    val twice = df.select(graft.ops.TextAnalysis.normalizeText(
        graft.ops.TextAnalysis.normalizeText(col("text"))).as("n2"))
      .collect().map(_.getString(0))
    assert(twice.toSeq === Seq("ab", "\"q\" 'y'", "a - b - c", "a b c", "a b c", "x y"))
  }

  test("padding report: when-chain buckets, clamping, exact pad sums") {
    val df = Seq(1L, 16L, 17L, 100L, 600L, 0L, -3L).toDF("toks")
    val out = graft.ops.Packing.paddingReport(df, "toks",
        boundaries = Seq(16, 32, 64, 128, 256, 512))
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 1,16 → bucket 16 (pad 15+0); 17 → 32 (pad 15); 100 → 128 (pad 28);
    // 600 clamps to 512 (pad 0); 0 and −3 drop
    assert(out.toSeq === Seq(
      (16L, 2L, 17L, 15L, math.round(15 * 10000.0 / 32)),
      (32L, 1L, 17L, 15L, math.round(15 * 10000.0 / 32)),
      (128L, 1L, 100L, 28L, math.round(28 * 10000.0 / 128)),
      (512L, 1L, 512L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      graft.ops.Packing.paddingReport(df, "toks", boundaries = Seq(32, 16))
    }
  }

  test("minhash quality report: clone recall 10000, bounded brute, refusal") {
    import graft.ops.Dedup
    val base = (1L to 30L).map(i =>
      (i, s"unique document number $i with its own words w${i}a w${i}b w${i}c"))
    // two exact clone PAIRS → 2 true pairs, both guaranteed candidates
    val corpus = (base ++ Seq(
      (101L, base.head._2), (102L, base.head._2),
      (201L, base(1)._2))).toDF("doc_id", "text")
    // rate 1.0: the whole corpus is the sample (hashBucket < 2^32 always)
    val r = Dedup.minhashQualityReport(corpus, "doc_id", "text",
      threshold = 0.8, sampleRate = 1.0).collect()(0)
    assert(r.getAs[Long]("n_sample") === 33L)
    // truth: (1,101), (1,102), (101,102), (2,201) — all jaccard 1.0
    assert(r.getAs[Long]("true_pairs") === 4L)
    // identical texts have identical signatures → banding finds all
    assert(r.getAs[Long]("true_cand_pairs") === 4L)
    assert(r.getAs[Long]("recall_e4") === 10000L)
    assert(r.getAs[Long]("cand_pairs") >= 4L)
    // the quadratic truth pass refuses loudly past the cap
    intercept[IllegalArgumentException] {
      Dedup.minhashQualityReport(corpus, "doc_id", "text",
        threshold = 0.8, sampleRate = 1.0, maxSample = 8).collect()
    }
  }

  test("sampleExact: exact k, prefix-nested, partitioning-invariant") {
    import graft.ops.Sampling
    val df = (1L to 200L).map(i => (i, s"r$i")).toDF("id", "v")
    val s10 = Sampling.sampleExact(df, "id", 10).select("id")
      .as[Long].collect().toSet
    val s25 = Sampling.sampleExact(df, "id", 25).select("id")
      .as[Long].collect().toSet
    assert(s10.size === 10 && s25.size === 25)
    // prefix property: a smaller draw is contained in a larger one
    assert(s10.subsetOf(s25))
    // k past n returns everything
    assert(Sampling.sampleExact(df, "id", 500).count() === 200L)
    // the draw is a pure function of (key, salt) — any partitioning
    val s10b = Sampling.sampleExact(df.repartition(13), "id", 10)
      .select("id").as[Long].collect().toSet
    assert(s10b === s10)
  }

  test("oov stats: min-count vocab, fixed-point rate, empty docs absent") {
    val df = Seq((1L, "a a b rare1"), (2L, "a b b"), (3L, "rare2"), (4L, " "))
      .toDF("doc_id", "text")
    val tf = TextAnalysis.termFrequencies(df, "doc_id", "text")
    val out = TextAnalysis.oovStatsFromTf(tf, "doc_id", minCount = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // ctf: a=3, b=3, rare1=1, rare2=1 → vocab {a, b}
    assert(out(1L) === ((4L, 1L, 2500L)))
    assert(out(2L) === ((3L, 0L, 0L)))
    assert(out(3L) === ((1L, 1L, 10000L)))
    assert(!out.contains(4L), "token-less doc must be absent")
  }

  test("astral-plane text passes through normalize/script ops uncorrupted") {
    // U+1F600 is a surrogate PAIR in the JVM: none of the normalization
    // or script classes may match half a pair or corrupt it — emoji
    // text must round-trip byte-identically and count in no script
    val emoji = new String(Character.toChars(0x1F600))
    val df = Seq((1L, s"hi $emoji there$emoji")).toDF("id", "text")
    val n = df.select(graft.ops.TextAnalysis.normalizeText(col("text")))
      .collect()(0).getString(0)
    assert(n === s"hi $emoji there$emoji")
    val p = graft.ops.TextAnalysis.scriptProfile(df, "id", "text").collect()(0)
    assert(p.getLong(1) === 7L) // hithere
    assert((2 to 6).map(p.getLong).sum === 0L)
    assert(p.getString(7) === "latin")
  }

  test("corpus card: dup mass, volumes, null-text accounting") {
    val df = Seq(
      (1L, "a", "one two three"), (2L, "a", "one two three"), // exact dups
      (3L, "a", "different text"),
      (4L, "b", null.asInstanceOf[String])).toDF("id", "src", "text")
    val out = TextAnalysis.corpusCard(df, "src", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") === ((3L, 2L, 8L, 26L + 14L))) // 3 docs, 2 distinct
    // null text: counted as a doc, contributes no tokens/bytes/distinct
    assert(out("b") === ((1L, 0L, 0L, 0L)))
  }

  test("score deciles: rank-counted thresholds on a duplicate-heavy grid") {
    val df = (Seq.fill(50)(1.0) ++ Seq.fill(30)(2.0) ++ Seq.fill(20)(5.0) ++
      Seq(Double.NaN)).toDF("s")
    val out = Selection.scoreDeciles(df, "s")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // n = 100 (NaN excluded); cum: 1.0→50, 2.0→80, 5.0→100
    (1 to 5).foreach(d => assert(out(d.toLong) === ((1.0, 50L)), s"d$d"))
    (6 to 8).foreach(d => assert(out(d.toLong) === ((2.0, 80L)), s"d$d"))
    (9 to 10).foreach(d => assert(out(d.toLong) === ((5.0, 100L)), s"d$d"))
  }

  test("z-score flags: exact moments, singleton/constant guards, cut") {
    val rows = (0 until 9).map(i => (i.toLong, "a", 100L)) ++ Seq(
      (9L, "a", 10000L), // the planted anomaly
      (100L, "b", 42L), // singleton group → z 0, never flagged
      (101L, "c", 7L), (102L, "c", 7L)) // zero variance → z 0
    val out = Selection.zScoreFlags(rows.toDF("id", "grp", "q4"), "grp", "q4")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getInt(4))).toMap
    val mean = 10900.0 / 10.0
    val varr = (100090000.0 - 10900.0 * mean) / 9.0
    val zOut = math.round((10000.0 - mean) / math.sqrt(varr) * 100)
    assert(out(9L) === ((zOut, 1)), s"expected z_e2 $zOut flagged")
    assert(zOut >= 250)
    assert(out(0L)._2 === 0 && out(0L)._1 < 0) // below the mean, unflagged
    assert(out(100L) === ((0L, 0)))
    assert(out(101L) === ((0L, 0)) && out(102L) === ((0L, 0)))
  }

  test("script profile: range counts, fixed-priority dominant, null text") {
    val df = Seq(
      (1L, "hello world 42"), // latin + digits
      (2L, "привет мир"), // cyrillic
      (3L, "你好 カタカナ"), // cjk + kana (both count as cjk)
      (4L, "αβγ abc"), // tie latin=greek=3 → latin wins by priority
      (5L, null.asInstanceOf[String]),
      (6L, "مرحبا") // arabic
    ).toDF("id", "text")
    val out = TextAnalysis.scriptProfile(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6)), r.getString(7))).toMap
    assert(out(1L)._1 === ((10L, 0L, 0L, 2L)) && out(1L)._2 === "latin")
    assert(out(2L)._2 === "cyrillic" && out(2L)._1._2 === 9L)
    assert(out(3L)._2 === "cjk")
    assert(out(4L)._2 === "latin") // priority breaks the 3-3 tie
    assert(out(5L)._2 === "latin" && out(5L)._1 === ((0L, 0L, 0L, 0L)))
    assert(out(6L)._2 === "arabic")
  }

  test("weighted interleave: proportional schedule, deterministic ties") {
    import graft.ops.Sampling
    // one shard, domain A (w=2) rows at pos 1..4, B (w=1) at pos 5..6:
    // keys A = .5, 1, 1.5, 2 and B = 1, 2; ties break by group then id
    val df = Seq(
      (1L, "A", 0L, 1L), (2L, "A", 0L, 2L), (3L, "A", 0L, 3L), (4L, "A", 0L, 4L),
      (5L, "B", 0L, 5L), (6L, "B", 0L, 6L)
    ).toDF("id", "grp", "shard", "pos")
    val ord = Sampling.interleaveByWeight(df, "id", "grp", Map("A" -> 2.0))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(ord === Map(1L -> 1L, 2L -> 2L, 5L -> 3L, 3L -> 4L, 4L -> 5L, 6L -> 6L))
    // law: ord is a 1..n permutation per shard, and each domain's rows
    // keep their relative pos order
    val big = (1L to 90L).map(i => (i, s"g${i % 3}", i % 2, i)).toDF("id", "grp", "shard", "pos")
    val out = Sampling.interleaveByWeight(big, "id", "grp",
        Map("g0" -> 3.0, "g1" -> 0.5)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
    for ((shard, rows) <- out.groupBy(_._3)) {
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length).toSeq, s"shard $shard")
      for ((_, grpRows) <- rows.groupBy(_._2)) {
        val byPos = grpRows.sortBy(_._1).map(_._4).toSeq
        assert(byPos === byPos.sorted, "within-domain order broken")
      }
    }
  }

  test("salted agg equals the direct aggregate on a hot-key corpus") {
    import graft.ops.Skew
    // 90% of rows under ONE key — the shape the salt exists for
    val rows = (1L to 200L).map(i =>
      (i, if (i <= 180) "hot" else s"k${i % 5}", i % 13))
    val df = rows.toDF("id", "key", "v")
    val got = Skew.saltedAgg(df, "key", "id", Seq("v"), buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = rows.groupBy(_._2).map { case (k, l) =>
      k -> (l.size.toLong, l.map(_._3).sum) }
    assert(got === want)
    // buckets = 1 degenerates to the direct shape, same values
    val one = Skew.saltedAgg(df, "key", "id", Seq("v"), buckets = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(one === want)
  }

  test("prototype pruning: ceil cut per cell, least-prototypical survive") {
    // two tight clusters around orthogonal axes
    val vecs =
      (0 until 10).map(i => (i.toLong, Array(1f, 0.01f * i, 0f, 0f))) ++
        (10 until 22).map(i => (i.toLong, Array(0f, 0.01f * (i - 10), 1f, 0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val kept = Similarity.prunePrototypes(df, "vec_id", "embedding",
      pruneFrac = 0.25, nLists = 2).collect()
    val keptByCell = kept.groupBy(_.getAs[Int]("cell"))
    val full = Similarity.prototypicality(df, "vec_id", "embedding", nLists = 2)
      .collect().groupBy(_.getAs[Int]("cell"))
    assert(keptByCell.keySet === full.keySet)
    for ((cell, rows) <- full) {
      val cut = math.ceil(0.25 * rows.length).toInt
      // survivors are exactly the members below the proto-desc cut
      val expected = rows
        .sortBy(r => (-r.getAs[Double]("proto"), r.getAs[Long]("vec_id")))
        .drop(cut).map(_.getAs[Long]("vec_id")).toSet
      val got = keptByCell(cell).map(_.getAs[Long]("vec_id")).toSet
      assert(got === expected, s"cell $cell")
      // and their reported rank is the within-cell prototypicality rank
      keptByCell(cell).foreach(r => assert(r.getAs[Long]("rn") > cut))
    }
  }
}
