package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck differential properties for the training-mixture layout
  * operators: epoch repetition and the shuffle-shard layout vs naive
  * in-memory references over random corpora — the count/coordinate
  * laws must hold for ANY id set and epoch map, not just the
  * handcrafted spec fixtures. */
object LayoutProps extends Properties("layout") {

  private lazy val spark = SparkSpec.session

  private val genIds: Gen[List[Long]] = for {
    n <- Gen.choose(1, 60)
    ids <- Gen.listOfN(n, Gen.choose(0L, 100000L))
  } yield ids.distinct

  private val genEpochs: Gen[Map[String, Double]] = for {
    e0 <- Gen.choose(0, 7).map(_ * 0.5) // 0.0, 0.5, ... 3.5
    e1 <- Gen.choose(0, 7).map(_ * 0.5)
  } yield Map("g0" -> e0, "g1" -> e1)

  /** The naive reference recomputes the integer-threshold Bernoulli
    * from the same portable hash (md5 first-8-hex), row by row. */
  private def bucket(key: Long, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$key:$salt".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  property("epochRepeat == naive per-row epoch law") = Prop.forAll(genIds, genEpochs) { (ids, eps) =>
    import spark.implicits._
    val rows = ids.map(i => (i, s"g${i % 2}"))
    val got = graft.ops.Sampling.epochRepeat(
        rows.toDF("id", "grp"), "id", "grp", eps, defaultEpochs = 1.0, salt = "lp")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val want = rows.flatMap { case (id, g) =>
      val e = eps(g)
      val frac = e - math.floor(e)
      val extra =
        if (bucket(id, "lp") < math.round(frac * 4294967296.0)) 1 else 0
      (0 until (math.floor(e).toInt + extra)).map(ep => (id, ep.toLong))
    }.toSet
    got == want
  }

  property("stratifiedSample == naive salted-hash rank per group") =
    Prop.forAll(genIds, Gen.choose(1, 6)) { (ids, k) =>
      import spark.implicits._
      val rows = ids.map(i => (i, s"g${i % 3}"))
      val got = graft.ops.Sampling.stratifiedSample(
          rows.toDF("id", "grp"), "id", "grp", k, salt = "lps")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val want = rows.groupBy(_._2).toSeq.flatMap { case (g, members) =>
        members.sortBy { case (id, _) => (bucket(id, "lps"), id) }
          .take(k).zipWithIndex
          .map { case ((id, _), i) => (id, g, i + 1) }
      }.toSet
      got == want
    }

  property("trainingShuffle is a bijection with dense in-shard positions") = Prop.forAll(genIds, Gen.choose(1, 9)) { (ids, nShards) =>
    import spark.implicits._
    val got = graft.ops.Shards.trainingShuffle(
        ids.map(Tuple1(_)).toDF("id"), "id", nShards)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bijective = got.map(_._1).toSet == ids.toSet && got.length == ids.size
    val shardsOk = got.forall { case (id, sh, _) =>
      sh == java.lang.Long.remainderUnsigned(bucket(id, "shuf:shard"), nShards.toLong) }
    val dense = got.groupBy(_._2).forall { case (_, g) =>
      g.map(_._3).sorted.toSeq == (1L to g.length) }
    // positions rank the salted pos-hash (key tie-break) within a shard
    val ranked = got.groupBy(_._2).forall { case (_, g) =>
      g.sortBy(_._3).map(_._1).toSeq ==
        g.map(_._1).sortBy(id => (bucket(id, "shuf:pos"), id)).toSeq }
    bijective && shardsOk && dense && ranked
  }
}
