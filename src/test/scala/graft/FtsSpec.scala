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
      "skywalker" -> "skywalk", "building" -> "build")
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

  test("BM25 scores match the hand-computed Okapi formula") {
    import spark.implicits._
    // N=4 docs, avgdl=4; 'quick' and 'fox' both have df=2
    // idf = ln(1 + (N - df + 0.5)/(df + 0.5)) = ln 2
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the lazy brown dog"),
      (3L, "quick quick fox fox fox"),
      (4L, "unrelated text entirely")).toDF("hash", "value")
    val idx = FtsIndex.build(docs)
    assert(idx.numDocs === 4 && math.abs(idx.avgdl - 4.0) < 1e-9)
    val m = idx.matchBm25("quick fox").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val ln2 = math.log(2.0)
    // doc1: tf=1, len=4 -> tfn = 2.2/2.2 = 1 per term -> 2*ln2
    assert(math.abs(m(1L) - 2 * ln2) < 1e-9)
    // doc3: len=5; quick tf=2 -> 4.4/3.425; fox tf=3 -> 6.6/4.425
    val expected3 = ln2 * (4.4 / 3.425 + 6.6 / 4.425)
    assert(math.abs(m(3L) - expected3) < 1e-9)
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
}
