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

  property("dsirResample == naive hashed-ngram importance model") =
    Prop.forAll(genDocs) { docs =>
      import spark.implicits._
      val B = 64 // tiny bucket space so hash collisions actually happen
      val tau = 2000L
      val df = docs.toDF("id", "text")
      val got = graft.ops.Dsir.resample(df,
          df.filter(org.apache.spark.sql.functions.col("id") % 3 === 0),
          "id", "text", tauE4 = tau, buckets = B)
        .select("id", "w_e4", "accept")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
      def h32(s: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex.substring(0, 8), 16)
      }
      def units(t: String): Seq[String] = {
        val ws = t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
        ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      }
      val feats: Map[Long, Map[Long, Long]] = docs.map { case (id, t) =>
        id -> units(t).groupBy(u => h32(u + ":dsir") % B)
          .map { case (f, l) => f -> l.size.toLong }
      }.toMap
      def tally(sel: Long => Boolean): Map[Long, Long] =
        feats.filter(kv => sel(kv._1)).values
          .flatten.groupBy(_._1).map { case (f, l) => f -> l.map(_._2).sum }
      val cagg = tally(_ => true)
      val tagg = tally(_ % 3 == 0)
      val (nc, nt) = (cagg.values.sum.toDouble, tagg.values.sum.toDouble)
      def lam(f: Long): Long =
        math.round(math.log((tagg.getOrElse(f, 0L) + 1) / (nt + B)) * 10000) -
          math.round(math.log((cagg.getOrElse(f, 0L) + 1) / (nc + B)) * 10000)
      val ws = docs.map { case (id, _) =>
        id -> feats(id).map { case (f, c) => c * lam(f) }.sum }.toMap
      val (sw, nw) = (ws.values.sum, ws.size.toLong)
      val want = docs.map { case (id, _) =>
        val u = (h32(id.toString + ":dsir-accept") + 1) / 4294967296.0
        val acc = if ((math.round(math.log(u) * 10000) + tau) * nw <
          ws(id) * nw - sw) 1 else 0
        id -> ((ws(id), acc))
      }.toMap
      got == want
    }

  property("bpeTrainMerges == naive in-memory BPE trainer") = {
    // tiny alphabet so heavy same-char runs occur — the regime where
    // the leftmost-greedy non-overlap semantics (run parity) matter
    val genBpeDocs: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 12)
      texts <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 6)
        ws <- Gen.listOfN(len, for {
          wl <- Gen.choose(1, 7)
          cs <- Gen.listOfN(wl, Gen.oneOf('a', 'b', 'c'))
        } yield cs.mkString)
      } yield ws.mkString(" "))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    Prop.forAll(genBpeDocs, Gen.choose(1, 6)) { (docs, k) =>
      import spark.implicits._
      val got = graft.ops.TextAnalysis.bpeTrainMerges(
          docs.toDF("id", "text"), "text", merges = k)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
      // naive trainer: same tokenization, same argmax order, leftmost-
      // greedy merge by explicit scan
      def mergeWord(toks: Vector[String], x: String, y: String): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
            out += (x + y); i += 2
          } else { out += toks(i); i += 1 }
        }
        out.result()
      }
      val words = docs.flatMap(_._2.trim.toLowerCase.split("\\s+"))
        .filter(_.nonEmpty)
      var segs: Seq[(Vector[String], Long)] = words.groupBy(identity).toSeq
        .map { case (w, l) => (w.map(_.toString).toVector, l.size.toLong) }
      val want = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, String, Long)]
      var r = 1
      var stop = false
      while (r <= k && !stop) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((t, c) <- segs; i <- 0 until t.length - 1)
          pc((t(i), t(i + 1))) = pc.getOrElse((t(i), t(i + 1)), 0L) + c
        if (pc.isEmpty) stop = true
        else {
          val ((x, y), cnt) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
          want += ((r.toLong, x, y, x + y, cnt))
          segs = segs.map { case (t, c) => (mergeWord(t, x, y), c) }
          r += 1
        }
      }
      // the application seam: the segmented vocabulary after the same
      // merges must equal the naive trainer's final state
      val gotSeg = graft.ops.TextAnalysis.bpeSegmentedVocab(
          docs.toDF("id", "text"), "text", merges = k)
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getString(2), r.getLong(3))).toMap
      val wantSeg = segs.map { case (t, c) =>
        t.mkString -> (c, t.mkString("|"), t.length.toLong) }.toMap
      got == want.toSeq && gotSeg == wantSeg
    }
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
