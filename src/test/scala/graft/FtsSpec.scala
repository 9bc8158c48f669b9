package graft

import graft.fts.{Analyzer, FtsIndex, PorterStemmer}

class FtsSpec extends SparkSpec {

  test("porter stemmer on classic vectors") {
    val cases = Map(
      "caresses" -> "caress", "ponies" -> "poni", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing", "happy" -> "happi",
      "relational" -> "relat", "conditional" -> "condit",
      "hopeful" -> "hope", "goodness" -> "good",
      "skywalker" -> "skywalk", "building" -> "build",
      // longest-match-only: step 4 selects `ement` (m=1, condition
      // fails, word unchanged) and must NOT fall through to `ent`
      "agreement" -> "agreement", "replacement" -> "replac",
      "adjustment" -> "adjust", "allowance" -> "allow")
    for ((in, out) <- cases)
      assert(PorterStemmer.stem(in) === out, s"stem($in)")
  }

  test("analyzer: split, accent strip, lowercase, stem") {
    assert(Analyzer.tokenize("Café-au-LAIT, 42 walking!").toSeq ===
      Seq("cafe", "au", "lait", "42", "walk"))
    assert(Analyzer.tokenize("").isEmpty)
    assert(Analyzer.tokenize(null).isEmpty)
  }

  test("BM25 conjunctive match over a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the lazy brown dog"),
      (3L, "quick quick fox fox fox"),
      (4L, "unrelated text entirely")).toDF("hash", "value")
    val idx = FtsIndex.build(docs)
    val m = idx.matchBm25("quick fox").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(m.keySet === Set(1L, 3L)) // conjunctive: both terms required
    assert(m(3L) > 0 && m(1L) > 0)
    // doc 3 has higher tf for both terms but is longer; both scores positive
    val single = idx.matchBm25("brown").collect().map(_.getLong(0)).toSet
    assert(single === Set(1L, 2L))
    assert(idx.matchBm25("nosuchterm quick").collect().isEmpty)
  }

  test("appendDelta == full rebuild: identical match sets AND scores") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-ftsdelta").toString
    val base = Seq(
      (1L, "the quick brown fox"),
      (2L, "the lazy brown dog"),
      (3L, "quick quick fox fox fox")).toDF("hash", "value")
    val delta = Seq(
      (10L, "a quick silver fox appears"),
      (11L, "entirely unrelated prose")).toDF("hash", "value")
    FtsIndex.write(FtsIndex.build(base), wh)
    assert(FtsIndex.appendDelta(spark, wh, delta))
    val incremental = FtsIndex.load(spark, wh).get
    val full = FtsIndex.build(base.union(delta))
    assert(incremental.numDocs === full.numDocs)
    assert(math.abs(incremental.avgdl - full.avgdl) < 1e-9)
    for (q <- Seq("quick fox", "brown", "quick", "unrelated prose")) {
      val a = incremental.matchBm25(q).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val b = full.matchBm25(q).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(a.keySet === b.keySet, s"[$q] match sets differ")
      for ((h, s) <- b)
        assert(math.abs(a(h) - s) < 1e-9, s"[$q] score drift for doc $h")
    }
    // termstats dfs sum across the base + delta appends
    val df = incremental.termstats
      .filter(org.apache.spark.sql.functions.col("term") === "quick")
      .collect()(0).getLong(1)
    assert(df === 3L, "df must sum base and delta document frequencies")
    // no index on disk → append is a no-op signal, not an error
    assert(!FtsIndex.appendDelta(spark, wh + "/nowhere", delta))
  }

  test("inverted-list df spans chunks: 64-doc term scores like a 64-df corpus") {
    import spark.implicits._
    // 64 docs sharing one term land in many pmod(hash, 32) chunks — the
    // window-summed df must still count all 64, exactly like the flat
    // postings would. idf is the sensitive factor: with N=64 docs and
    // df=64, idf = ln(1 + 0.5/64.5); any chunk-local df inflates it.
    val docs = (1L to 64L).map(i => (i, "sharedterm")).toDF("hash", "value")
    val idx = FtsIndex.build(docs)
    val chunks = idx.postingLists.select("chunk").distinct().count()
    assert(chunks > 1, "fixture must actually span multiple chunks")
    val scores = idx.matchBm25("sharedterm").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(scores.length === 64)
    val expIdf = math.log(1.0 + (64.0 - 64.0 + 0.5) / (64.0 + 0.5))
    // tf=1, len=1=avgdl → tf term = (1*2.2)/(1+1.2) = 1 → score == idf
    for ((h, s) <- scores)
      assert(math.abs(s - expIdf) < 1e-12, s"doc $h score $s != idf $expIdf")
  }

  test("BM25 scores match the hand-computed Okapi formula") {
    import spark.implicits._
    // stopwords 'the' (docs 1,2) and 'entirely' (doc 4) are dropped at
    // index time (DuckDB stopwords='english' default), so doc lengths are
    // 3,3,5,2 -> N=4, avgdl=3.25; 'quick'/'fox' both df=2 -> idf = ln 2
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the lazy brown dog"),
      (3L, "quick quick fox fox fox"),
      (4L, "unrelated text entirely")).toDF("hash", "value")
    val idx = FtsIndex.build(docs)
    assert(idx.numDocs === 4 && math.abs(idx.avgdl - 3.25) < 1e-9)
    val m = idx.matchBm25("quick fox").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val ln2 = math.log(2.0)
    def tfn(tf: Double, len: Double): Double =
      tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / 3.25))
    // doc1: len=3, tf=1 each term
    assert(math.abs(m(1L) - 2 * ln2 * tfn(1, 3)) < 1e-9)
    // doc3: len=5; quick tf=2, fox tf=3
    assert(math.abs(m(3L) - ln2 * (tfn(2, 5) + tfn(3, 5))) < 1e-9)
  }

  test("stopwords: dropped from the index, kept in conjunctive queries") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick silver")).toDF("hash", "value")
    val idx = FtsIndex.build(docs)
    // index side: 'the' never entered the dict
    assert(idx.termstats.filter(org.apache.spark.sql.functions.col("term") === "the")
      .count() === 0)
    // query side keeps the stopword -> conjunctive match finds nothing,
    // exactly like DuckDB match_bm25(conjunctive:=1) over a stopped index
    assert(idx.matchBm25("the quick").collect().isEmpty)
    assert(idx.matchBm25("quick").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("settings: stemmer=none and custom separator via pragma syntax") {
    import spark.implicits._
    import graft.fts.FtsSettings
    val st = FtsSettings.parse(
      "ignore = '[^a-zA-Z0-9_]+', strip_accents = 1, lower=1, stemmer='none', stopwords='none'")
    assert(st.stemmer === "none" && st.stopwords === "none" && st.ignore === "[^a-zA-Z0-9_]+")
    val docs = Seq((1L, "the running RUNNER_X"), (2L, "runner_x walks")).toDF("hash", "value")
    val idx = FtsIndex.build(docs, settings = st)
    // no stemming: 'running' stays whole; '_' kept by the separator;
    // no stopwords: 'the' is indexed
    val terms = idx.termstats.collect().map(_.getString(0)).toSet
    assert(terms.contains("running") && terms.contains("runner_x") && terms.contains("the"))
    assert(idx.matchBm25("runner_x").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // and the query analyzer respects stemmer=none: 'walks' != 'walk'
    assert(idx.matchBm25("walk").collect().isEmpty)
  }

  test("BIKIDATA_FTS_SETTINGS env override wins wholesale") {
    import graft.fts.FtsSettings
    val st = FtsSettings.resolve(stemmer = "porter",
      env = Map("BIKIDATA_FTS_SETTINGS" -> "stemmer='none', lower=0"))
    assert(st.stemmer === "none" && !st.lower && st.stripAccents)
    val st2 = FtsSettings.resolve(stemmer = "none", env = Map.empty)
    assert(st2.stemmer === "none" && st2.stopwords === "english")
  }

  test("ftss doc table aggregates 1-hop and 2-hop literals") {
    val ctx = Fixture.ctx(spark)
    val docs = FtsIndex.buildFtss(ctx.graph.triples, ctx.graph.literals)
    import graft.functions.Hash64
    val lukeDoc = docs.filter(org.apache.spark.sql.functions.col("s") ===
      Hash64.hashString("<http://ex/luke>")).collect()
    assert(lukeDoc.length === 1)
    val text = lukeDoc(0).getString(1)
    // 1-hop: own labels; 2-hop: tatooine's labels via homeworld
    assert(text.contains("Luke Skywalker"))
    assert(text.contains("Tatooine"))
  }

  test("FtsTokensExpr == indexTokens UDF, token for token") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "Caf\u00e9-au-LAIT, 42 walking!"),
      (2L, "The Quick BROWN fox; \u00fcber-\u00c4pfel na\u00efve prose"),
      (3L, ""),
      (4L, null.asInstanceOf[String]),
      (5L, "the and of to a in"), // pure stopwords -> empty
      (6L, "running builders happiness relational conditioning"),
      (7L, "x " * 300 + "repeated tail")).toDF("hash", "value")
    for (st <- Seq(graft.fts.FtsSettings(),
        graft.fts.FtsSettings(stemmer = "none"),
        graft.fts.FtsSettings(stopwords = "none"),
        graft.fts.FtsSettings(ignore = "[^a-z]+", stripAccents = false))) {
      val udfTok = udf((s: String) => st.indexTokens(s))
      val rows = docs.select(col("hash"),
          graft.functions.FtsTokensExpr(col("value"), st).as("e"),
          udfTok(col("value")).as("u"))
        .collect()
      rows.foreach { r =>
        val e = r.getSeq[String](1)
        // the UDF returned null-safe arrays for all non-null inputs; for
        // null text both sides must surface a ZERO-LENGTH doc
        val u = if (r.isNullAt(2)) Seq.empty[String] else r.getSeq[String](2)
        assert(e === u, s"hash=${r.getLong(0)} settings=$st")
      }
    }
  }

  test("index build path carries no ScalaUDF (tokenize is codegen)") {
    import spark.implicits._
    // parquet-backed corpus: a LocalRelation would let the optimizer
    // pre-evaluate the projection and hide the expression from the plan
    val dir = java.nio.file.Files.createTempDirectory("graft-ftsplan").toString
    Seq((1L, "quick brown fox")).toDF("hash", "value")
      .write.mode("overwrite").parquet(dir)
    val idx = FtsIndex.build(spark.read.parquet(dir))
    val plan = idx.postings.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("scalaudf"), plan)
    assert(plan.contains("fts_token_counts"), plan)
    // and tf is counted row-locally: the ONLY exchange in the postings
    // plan is the term-clustering repartition, never a groupBy shuffle
    assert(!plan.contains("hashaggregate"), plan)
    assert(plan.split("exchange").length - 1 === 1, plan)
  }

  test("FtsTokensExpr.compute == indexTokens on random unicode strings") {
    import org.apache.spark.unsafe.types.UTF8String
    val st = graft.fts.FtsSettings()
    val stNone = graft.fts.FtsSettings(stemmer = "none", stopwords = "none")
    val rnd = new scala.util.Random(20260815L)
    val alphabet =
      "abz AZ09-_.!\u00e9\u00fc\u00df\u0130\u0131\u4e2d\u6587\u0001\n\t'\"\\" + "\ud83d\ude00"
    (1 to 500).foreach { _ =>
      val len = rnd.nextInt(60)
      val t = Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      for (settings <- Seq(st, stNone)) {
        val viaExpr = graft.functions.FtsTokensExpr
          .compute(UTF8String.fromString(t), settings)
          .toArray[UTF8String](org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
        assert(viaExpr === settings.indexTokens(t).toSeq, s"text=${t.map(_.toInt)}")
      }
    }
    // and the null carrier contract
    assert(graft.functions.FtsTokensExpr.compute(null, st).numElements() === 0)
  }

  test("FtsTokenCountsExpr == explode+group tf counting on random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val st = graft.fts.FtsSettings()
    def viaExpr(t: String): (Int, Map[String, Long]) = {
      val r = graft.functions.FtsTokenCountsExpr
        .compute(if (t == null) null else UTF8String.fromString(t), st)
        .asInstanceOf[GenericInternalRow]
      val len = r.getInt(0)
      val arr = r.getArray(1)
      val m = (0 until arr.numElements()).map { i =>
        val e = arr.getStruct(i, 2)
        e.getUTF8String(0).toString -> e.getLong(1)
      }.toMap
      (len, m)
    }
    def brute(t: String): (Int, Map[String, Long]) = {
      val toks = st.indexTokens(if (t == null) "" else t)
      (toks.length, toks.groupBy(identity).view.mapValues(_.length.toLong).toMap)
    }
    val rnd = new scala.util.Random(8L)
    val words = Seq("walking", "the", "cafe", "caf\u00e9", "Builds", "42", "x")
    val texts = (1 to 300).map { _ =>
      Seq.fill(rnd.nextInt(20))(words(rnd.nextInt(words.length))).mkString(" ")
    } ++ Seq("", null)
    texts.foreach { t =>
      assert(viaExpr(t) === brute(t), s"text=$t")
    }
  }

  test("splitDefault == default-separator regex split on random strings") {
    val re = java.util.regex.Pattern.compile(Analyzer.DefaultSeparator)
    val rnd = new scala.util.Random(99L)
    val alphabet = "abcXYZ019 .,;-_\u00e9\u4e2d\t\n'" + "\ud83d\ude00" + "\u0000"
    val fixed = Seq("", "abc", "  ", "a1b2", "--x--", "\u00e9\u00e9", "a\ud83d\ude00b")
    val randoms = (1 to 1000).map { _ =>
      Array.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    (fixed ++ randoms).foreach { t =>
      assert(Analyzer.splitDefault(t).toSeq ===
        re.split(t).filter(_.nonEmpty).toSeq, s"text=${t.map(_.toInt)}")
    }
  }
}
