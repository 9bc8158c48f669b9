package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck differential properties for the dedup substrate: the
  * prefix-filtered Jaccard plan and both connected-component paths
  * (driver union-find and distributed min-label propagation) vs naive
  * in-memory references over random corpora and pair graphs — the
  * losslessness and component laws must hold for ANY token overlap
  * structure, not just the handcrafted fixtures. */
object DedupProps extends Properties("dedup") {

  // the distributed-components leg checkpoints per round — 40 random
  // cases keep the suite's wall time bounded while still sweeping the
  // edge-structure space
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(40)

  private lazy val spark = SparkSpec.session

  // small vocab forces heavy token overlap (the prefix filter's hard
  // regime: rare-token candidates must still cover every true pair)
  private val vocab = Vector("red", "blue", "fast", "car", "ship", "hub")

  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 18)
    docs <- Gen.listOfN(n, Gen.choose(1, 5)
      .flatMap(k => Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private val genThreshold: Gen[Double] = Gen.oneOf(0.3, 0.5, 0.8)

  property("stripDupSpans == naive coverage-union strip over random corpora") =
    Prop.forAll(genCorpus) { corpus =>
      import spark.implicits._
      val n = 3
      val got = graft.ops.Decontam.stripDupSpans(
          corpus.toDF("id", "text"), "id", "text", n = n)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      val toks = corpus.map { case (i, t) =>
        i -> t.trim.split("\\s+").toSeq.filter(_.nonEmpty) }.toMap
      val gramsOf = toks.map { case (i, ws) =>
        i -> ws.sliding(n).filter(_.size == n).map(_.mkString(" ")).toVector }
      val df = gramsOf.toSeq.flatMap { case (i, gs) => gs.distinct.map(_ -> i) }
        .groupBy(_._1).map { case (g, l) => g -> l.size }
      val want = corpus.flatMap { case (i, _) =>
        val ws = toks(i)
        val covered = gramsOf(i).zipWithIndex.collect {
          case (g, p) if df(g) >= 2 => p until (p + n)
        }.flatten.toSet
        val kept = ws.zipWithIndex.collect {
          case (w, p) if !covered(p) => w }
        if (kept.isEmpty) None
        else Some(i -> ((kept.mkString(" "), kept.size.toLong,
          (ws.size - kept.size).toLong)))
      }.toMap
      got == want
    }

  property("tokenJaccardPairs == naive set-Jaccard over random corpora") =
    Prop.forAll(genCorpus, genThreshold) { (corpus, th) =>
      import spark.implicits._
      val got = graft.ops.Dedup.tokenJaccardPairs(
          corpus.toDF("id", "text"), "id", "text", th)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val sets = corpus.map { case (i, t) => i -> t.split("\\s+").toSet }
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        jr = BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if jr >= th
      } yield ((a, b), jr)).toMap
      got == want
    }

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 25)
    es <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 14L); b <- Gen.choose(0L, 14L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield es.distinct

  /** Naive union-find. */
  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    ids.map(i => i -> find(i)).toMap
  }

  private val genBench: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 4)
    docs <- Gen.listOfN(n, Gen.choose(3, 6)
      .flatMap(k => Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (100L + i, t) }

  /** Mirror of TextAnalysis.wordGrams: whitespace tokens, sliding-n
    * space-joined, distinct; < n tokens -> none. */
  private def ngrams(text: String, n: Int): Set[String] = {
    val toks = text.trim.split("\\s+")
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  property("decontamination == naive shared-ngram scan") =
    Prop.forAll(genCorpus, genBench, Gen.choose(2, 4)) { (corpus, bench, n) =>
      import spark.implicits._
      val gotFlagged = graft.ops.Decontam.contaminated(
          corpus.toDF("id", "text"), bench.toDF("id", "text"), "id", "text", n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val benchGrams = bench.flatMap(b => ngrams(b._2, n)).toSet
      val wantFlagged = corpus
        .map { case (i, t) => i -> ngrams(t, n).count(benchGrams) }
        .filter(_._2 >= 1).map { case (i, h) => i -> h.toLong }.toMap
      val gotClean = graft.ops.Decontam.clean(
          corpus.toDF("id", "text"), bench.toDF("id", "text"), "id", "text", n)
        .collect().map(_.getLong(0)).toSet
      val wantClean = corpus.map(_._1).toSet -- wantFlagged.keySet
      gotFlagged == wantFlagged && gotClean == wantClean
    }

  property("clusters == naive union-find on BOTH execution paths") =
    Prop.forAll(genEdges) { edges =>
      import spark.implicits._
      val want = components(edges).toSet
      val pairs = edges.toDF("a", "b")
      def run(maxDriverEdges: Long) =
        graft.ops.Dedup.clusters(pairs, maxDriverEdges = maxDriverEdges)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // driver union-find path AND the distributed min-label path must
      // both match the reference (maxDriverEdges = 0 forces distributed)
      run(200000L) == want && run(0L) == want
    }
}
