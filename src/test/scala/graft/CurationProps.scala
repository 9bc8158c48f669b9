package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck differential properties for the round-9 curation
  * operators: each distributed implementation must reproduce a naive
  * in-memory reference over ANY random input — tiny alphabets so
  * collisions and ties happen constantly (the regime where tie-break
  * and boundary bugs show). */
object CurationProps extends Properties("curation") {

  private lazy val spark = SparkSpec.session

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 25)
    texts <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 10)
      ws <- Gen.listOfN(len, Gen.oneOf("ab", "ba", "abc", "a", "bb", "AB"))
    } yield ws.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("bpePairCounts == naive frequency-weighted pair table") =
    Prop.forAll(genDocs) { docs =>
      import spark.implicits._
      val got = graft.ops.TextAnalysis
        .bpePairCounts(docs.toDF("id", "text"), "text", k = 1000)
        .collect().map(r => (r.getString(0), r.getLong(1))).toList
      val words = docs.flatMap(_._2.trim.toLowerCase.split("\\s+"))
        .filter(_.nonEmpty)
      val wc = words.groupBy(identity).map { case (w, l) => w -> l.size.toLong }
      val want = wc.toSeq.flatMap { case (w, c) =>
        w.sliding(2).filter(_.length == 2).map(_ -> c) }
        .groupBy(_._1).map { case (p, l) => p -> l.map(_._2).sum }
        .toList.sortBy { case (p, c) => (-c, p) }
      got == want
    }

  private val genScored: Gen[List[(String, Long, Double)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("en", "de", "fr")
      s <- Gen.choose(0, 5) // tiny range → constant score ties
    } yield (g, s.toDouble))
  } yield rows.zipWithIndex.map { case ((g, s), i) => (g, i.toLong, s) }

  property("scoreBuckets == naive per-group tertile labeling") =
    Prop.forAll(genScored) { rows =>
      import spark.implicits._
      val got = graft.ops.Selection
        .scoreBuckets(rows.toDF("g", "id", "s"), "g", "s", "id")
        .collect().map(r => r.getLong(1) -> r.getString(3)).toMap
      val want = rows.groupBy(_._1).flatMap { case (_, grp) =>
        val n = grp.size
        val h = math.ceil(n / 3.0).toLong
        val m = math.ceil(n * 2.0 / 3.0).toLong
        grp.sortBy(r => (r._3, r._2)).zipWithIndex.map { case (r, i) =>
          r._2 -> (if (i + 1 <= h) "head" else if (i + 1 <= m) "middle" else "tail")
        }
      }
      got == want
    }

  private val genUrls: Gen[(List[(Long, String)], List[String])] = for {
    n <- Gen.choose(1, 30)
    urls <- Gen.listOfN(n, for {
      labels <- Gen.choose(1, 4)
      host <- Gen.listOfN(labels, Gen.oneOf("a", "b", "cc", "www")).map(_.mkString("."))
      scheme <- Gen.oneOf("http://", "HTTPS://", "")
    } yield s"$scheme$host/p")
    nb <- Gen.choose(1, 3)
    blocked <- Gen.listOfN(nb, for {
      l <- Gen.choose(1, 2)
      d <- Gen.listOfN(l, Gen.oneOf("a", "b", "cc")).map(_.mkString("."))
    } yield d)
  } yield (urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }, blocked.distinct)

  property("filterBlockedDomains == naive suffix filter") =
    Prop.forAll(genUrls) { case (rows, blocked) =>
      import spark.implicits._
      val got = graft.ops.Urls
        .filterBlockedDomains(rows.toDF("id", "url"), "url", blocked)
        .select("id").collect().map(_.getLong(0)).toSet
      // naive reference over the same normalization rules: lowercase,
      // leading www. label dropped when an authority is present
      val want = rows.filter { case (_, u) =>
        val m = "^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)".r.findFirstMatchIn(u.trim)
        m match {
          case None => true // no authority → kept
          case Some(g) =>
            val host0 = g.group(1).toLowerCase
            val host = if (host0.startsWith("www.")) host0.drop(4) else host0
            !blocked.map(_.toLowerCase).exists(d => host == d || host.endsWith("." + d))
        }
      }.map(_._1).toSet
      got == want
    }

  private val genShardDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 40)
    texts <- Gen.listOfN(n, Gen.oneOf("x", "yy", "zzz", ""))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("saltedAgg == direct aggregate for any bucket count") =
    Prop.forAll(genShardDocs, Gen.choose(1, 9)) { (docs, buckets) =>
      import spark.implicits._
      val df = docs.map { case (id, t) => (id, s"k${id % 3}", t.length.toLong) }
        .toDF("id", "key", "v")
      val got = graft.ops.Skew.saltedAgg(df, "key", "id", Seq("v"), buckets)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = docs.map { case (id, t) => (s"k${id % 3}", t.length.toLong) }
        .groupBy(_._1).map { case (k, l) => k -> (l.size.toLong, l.map(_._2).sum) }
      got == want
    }

  property("interleaveByWeight == naive two-window schedule") =
    Prop.forAll(genScored) { rows =>
      import spark.implicits._
      // reuse the scored generator: (group, id, score) → shard = id % 2,
      // pos = id (any strictly increasing per-shard pos works)
      val df = rows.map { case (g, id, _) => (id, g, id % 2, id) }
        .toDF("id", "grp", "shard", "pos")
      val weights = Map("en" -> 2.5, "de" -> 0.5)
      val got = graft.ops.Sampling.interleaveByWeight(df, "id", "grp", weights)
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
      val want = rows.map { case (g, id, _) => (id, g, id % 2) }
        .groupBy(_._3).flatMap { case (_, sh) =>
          val ranked = sh.groupBy(_._2).flatMap { case (g, l) =>
            l.sortBy(_._1).zipWithIndex.map { case (r, i) =>
              (r._1, g, (i + 1).toDouble / weights.getOrElse(g, 1.0)) }
          }
          ranked.toSeq.sortBy { case (id, g, k) => (k, g, id) }
            .zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1).toLong }
        }
      got == want
    }

  property("manifest is invariant to input order and partitioning") =
    Prop.forAll(genShardDocs, Gen.choose(1, 5)) { (docs, nShards) =>
      import spark.implicits._
      def m(df: org.apache.spark.sql.DataFrame) =
        graft.ops.Shards.manifest(
            graft.ops.Shards.trainingShuffle(df, "doc_id", nShards),
            "doc_id", "text")
          .orderBy("shard").collect().map(_.toSeq).toList
      val a = m(docs.toDF("doc_id", "text"))
      val b = m(docs.reverse.toDF("doc_id", "text").repartition(3))
      a == b
    }
}
