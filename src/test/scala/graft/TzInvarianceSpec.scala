package graft

import org.apache.spark.sql.DataFrame

/** The driver's correctness harness controls its own Spark session, so we
  * cannot rely on `spark.sql.session.timeZone=UTC` being set. Every gate
  * query whose values pass through timestamp semantics must therefore be
  * TZ-invariant: identical results under any session timezone.
  *
  * Round-1 regression: `q1_agg` and `q_events_window` hash-failed at the
  * driver because `lit("...").cast("timestamp")` and
  * `date_format(window.start, ...)` shift with the session TZ.
  */
class TzInvarianceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def collectUnder(tz: String, ntz: Boolean, q: String): Seq[String] = {
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    val ntzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prevNtz = spark.conf.get(ntzKey)
    spark.conf.set("spark.sql.session.timeZone", tz)
    spark.conf.set(ntzKey, ntz.toString)
    try SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
    finally {
      spark.conf.set("spark.sql.session.timeZone", prevTz)
      spark.conf.set(ntzKey, prevNtz)
    }
  }

  // one zone west of UTC (shifts dates backward at midnight) and one east
  private val zones = Seq("UTC", "America/New_York", "Asia/Tokyo")

  for (q <- Seq("q1_agg", "q1_agg_counts", "q3_join", "q_events_window", "q_events_sessions")) {
    test(s"$q is session-timezone-invariant in both parquet read modes") {
      // reference result: NTZ read under UTC
      val base = collectUnder("UTC", ntz = true, q)
      assert(base.nonEmpty)
      for (z <- zones; ntz <- Seq(true, false))
        assert(collectUnder(z, ntz, q) == base, s"tz=$z ntz=$ntz differs")
    }
  }

  test("rdfize date rendering is session-timezone-invariant in both read modes") {
    def dates(tz: String, ntz: Boolean): Seq[String] = {
      val prevTz = spark.conf.get("spark.sql.session.timeZone")
      val ntzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
      val prevNtz = spark.conf.get(ntzKey)
      spark.conf.set("spark.sql.session.timeZone", tz)
      spark.conf.set(ntzKey, ntz.toString)
      try {
        val q: DataFrame = graft.rdfize.Rdfize.quads(spark, sf)
        q.filter(org.apache.spark.sql.functions.col("p") ===
            graft.rdfize.Rdfize.predIri("orders", "o_orderdate"))
          .orderBy("s").limit(20).collect().map(_.getString(2)).toSeq
      } finally {
        spark.conf.set("spark.sql.session.timeZone", prevTz)
        spark.conf.set(ntzKey, prevNtz)
      }
    }
    val utc = dates("UTC", ntz = true)
    assert(utc.nonEmpty && utc.head.contains("^^"))
    for (z <- zones; ntz <- Seq(true, false))
      assert(dates(z, ntz) == utc, s"tz=$z ntz=$ntz differs")
  }
}
