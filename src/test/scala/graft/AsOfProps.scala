package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck differential properties for the time-series joins: the
  * union-tag-window as-of carry and the bucket-and-verify band join vs
  * naive O(n²) scans over random keyed timestamp data — equality must
  * hold for ANY clustering of timestamps (equal-ts ties, sparse and
  * dense keys, staleness gaps), not just the spec fixtures. */
object AsOfProps extends Properties("asof") {

  private lazy val spark = SparkSpec.session

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private val genLeft: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 2L)
      t <- Gen.choose(0L, 120L)
    } yield (k, t))
  } yield rows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }

  private val genRight: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 20)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 2L)
      t <- Gen.choose(0L, 120L)
    } yield (k, t))
    // the operator requires unique (key, ts) on the right side
  } yield rows.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }

  private val genTol: Gen[Option[Long]] =
    Gen.oneOf(Gen.const(None), Gen.choose(1L, 40L).map(Some(_)))

  property("asofJoin == naive latest-right-at-or-before scan") =
    Prop.forAll(genLeft, genRight, genTol) { (lrows, rrows, tol) =>
      import spark.implicits._
      val left = lrows.map { case (k, t, id) => (k, ts(t), id) }.toDF("k", "ts", "lid")
      val right = rrows.map { case (k, t, id) => (k, ts(t), id) }.toDF("k", "ts", "rid")
      val got = graft.ops.AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rid"),
          toleranceSeconds = tol)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L, r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val want = lrows.map { case (k, t, lid) =>
        val cand = rrows.filter(r => r._1 == k && r._2 <= t &&
          tol.forall(b => t - r._2 <= b))
        val m = if (cand.isEmpty) None
                else Some(cand.maxBy(_._2)._3) // unique (k, ts) => unique argmax
        (k, t, lid, m)
      }.toSet
      got == want
    }

  property("rangeSelfPairs == naive banded O(n^2) pair scan") =
    Prop.forAll(genLeft, Gen.choose(1L, 50L)) { (rows, band) =>
      import spark.implicits._
      val df = rows.map { case (k, t, id) => (k, id, ts(t)) }.toDF("k", "id", "ts")
      val got = graft.ops.AsOf.rangeSelfPairs(df, Seq("k"), "ts", "id", band)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (k1, t1, i1) <- rows; (k2, t2, i2) <- rows
        if k1 == k2 && i1 != i2
        if (t2 > t1 && t2 - t1 <= band) || (t2 == t1 && i2 > i1)
      } yield (k1, i1, i2)).toSet
      got == want
    }
}
