package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck differential properties for the LM-surprisal scorers:
  * both fixed-point NLL operators must reproduce a naive in-memory
  * model over ANY random corpus — tiny vocab so counts collide hard
  * (the regime where a smoothing or context-count bug actually
  * shows). */
object LmProps extends Properties("lm") {

  private lazy val spark = SparkSpec.session

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 25)
    texts <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "dd", "e"))
    } yield ws.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def toks(t: String): Seq[String] = t.trim.split("\\s+").toSeq

  property("bigramNll == naive add-one bigram model") = Prop.forAll(genDocs) { docs =>
    import spark.implicits._
    val got = graft.ops.TextAnalysis.bigramNll(
        docs.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bgs = docs.flatMap { case (id, t) =>
      toks(t).sliding(2).filter(_.size == 2).map(p => (id, p.mkString(" "))) }
    val cbg = bgs.groupBy(_._2).map { case (g, l) => g -> l.size.toLong }
    val cu = cbg.groupBy(_._1.split(" ")(0)).map { case (w, m) => w -> m.values.sum }
    val v = docs.flatMap(d => toks(d._2)).distinct.size.toLong
    val want = bgs.groupBy(_._1).map { case (id, l) =>
      id -> (l.map { case (_, g) =>
        math.round(-math.log((cbg(g) + 1.0) / (cu(g.split(" ")(0)) + v)) * 10000)
      }.sum, l.size.toLong)
    }
    got == want
  }

  property("unigramNll == naive corpus-frequency model") = Prop.forAll(genDocs) { docs =>
    import spark.implicits._
    val got = graft.ops.TextAnalysis.unigramNll(
        docs.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // termFrequencies tokenization: lower + trim + \s+ split, empties out
    def terms(t: String) = t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val all = docs.flatMap(d => terms(d._2))
    val ctf = all.groupBy(identity).map { case (w, l) => w -> l.size.toLong }
    val n = all.size.toDouble
    val want = docs.map { case (id, t) => id -> terms(t) }
      .filter(_._2.nonEmpty)
      .map { case (id, ws) =>
        id -> (ws.map(w => math.round(-math.log(ctf(w) / n) * 10000)).sum,
          ws.size.toLong)
      }.toMap
    got == want
  }
}
