package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decomposes construction-time vs action-time jobs for the
  * facet family and times candidate probe shapes. Not product surface. */
object DevCacheProbe {
  private def time[A](label: String, n: Int = 7)(f: => A): A = {
    f
    var last: A = null.asInstanceOf[A]
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime(); last = f; (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[probe] $label%-46s median ${ts(n / 2)}%.3f s  (min ${ts.head}%.3f)")
    last
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ctx = graft.rdfize.Rdfize.ctx(spark, dir)
    val jc = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jc.incrementAndGet(); () }
    })
    def jobs[A](label: String)(f: => A): A = {
      Thread.sleep(100); jc.set(0)
      val r = f
      Thread.sleep(100)
      println(s"[probe] $label jobs=${jc.get()}")
      r
    }
    val fn = RdfQueries.queries("q_rdf_facet_graphs")
    val df = jobs("facet_graphs CONSTRUCT")(fn(spark, dir))
    jobs("facet_graphs COUNT")(df.count())
    time("facet_graphs end-to-end")(fn(spark, dir).count())

    // candidate: isin-probed subject side
    val t = ctx.graph.triples
    val pNName = graft.algebra.FilterCompiler.h(graft.rdfize.Rdfize.predIri("nation", "n_name"))
    def isinShape(): Long = {
      val probe = t.filter(col("p") === pNName).select("s").limit(10001).collect().map(_.getLong(0))
      t.filter(col("s").isin(probe.toIndexedSeq: _*))
        .groupBy(col("g")).agg(count(lit(1)).as("count"))
        .select(col("count"), ctx.decodeExpr(col("g")).get.as("val")).count()
    }
    time("facet isin-probe shape")(isinShape())
    jobs("facet isin-probe jobs")(isinShape())
  }
}
