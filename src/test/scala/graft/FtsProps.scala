package graft

import graft.fts.{FtsIndex, FtsSettings}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck differential property for the FTS match path: the
  * term-pruned inverted-list BM25 plan vs a naive in-memory BM25
  * computed from the SAME analyzer functions, over random corpora and
  * queries — match sets must be identical and scores equal to FP-sum
  * tolerance for ANY token distribution, not just the FtsSpec
  * vectors. */
object FtsProps extends Properties("fts") {

  private lazy val spark = SparkSpec.session
  private val settings = FtsSettings()

  // vocab mixes plain words, an accented form (analyzer folds it), a
  // stopword (indexer drops it; a query containing it matches nothing),
  // and morphological variants (stemmer coverage)
  private val vocab = Vector("red", "widget", "café", "the",
    "running", "runs", "gadget", "blue")

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 6)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private val genCorpus: Gen[List[String]] =
    Gen.choose(2, 25).flatMap(n => Gen.listOfN(n, genDoc))

  private val genQuery: Gen[String] = for {
    n <- Gen.choose(1, 2)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab :+ "unknownword"))
  } yield ws.mkString(" ")

  /** Naive BM25 over the same analyzer output. */
  private def naive(docs: Seq[(Long, String)], query: String,
      k1: Double, b: Double): Map[Long, Double] = {
    val toks = docs.map { case (h, t) => h -> settings.indexTokens(t).toSeq }
    val n = docs.length.toDouble
    val avgdl = if (docs.isEmpty) 0.0 else toks.map(_._2.length).sum / n
    val terms = settings.queryTokens(query)
    if (terms.isEmpty) return Map.empty
    val df = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    toks.flatMap { case (h, dtoks) =>
      val tfs = terms.map(t => t -> dtoks.count(_ == t).toDouble)
      if (tfs.exists(_._2 == 0.0)) None
      else Some(h -> tfs.map { case (t, tf) =>
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dtoks.length / avgdl))
      }.sum)
    }.toMap
  }

  property("matchBm25 == naive conjunctive BM25 over random corpora") =
    Prop.forAll(genCorpus, genQuery) { (corpus, query) =>
      import spark.implicits._
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong + 1L, t) }
      val idx = FtsIndex.build(docs.toDF("hash", "value"), settings = settings)
      val got = idx.matchBm25(query).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = naive(docs, query, idx.k1, idx.b)
      val sameSet = got.keySet == want.keySet
      val sameScores = sameSet && got.forall { case (h, s) =>
        math.abs(s - want(h)) <= 1e-9 * math.max(1.0, math.abs(s)) }
      if (!(sameSet && sameScores))
        println(s"FTS MISMATCH query='$query' got=$got want=$want corpus=$docs")
      sameSet && sameScores
    }
}
