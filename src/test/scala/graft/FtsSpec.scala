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
