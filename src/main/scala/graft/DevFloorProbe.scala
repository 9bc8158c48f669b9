package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: per-query steady-state latency of the engine-vs-engine
  * rdf query set under AQE on vs off, plus job counts — attributes the
  * local-mode scheduling floor (jobs × floor) per query. */
object DevFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq(
      "q_rdf_filter_po", "q_rdf_filter_p", "q_rdf_filter_o", "q_rdf_and",
      "q_rdf_or", "q_rdf_not", "q_rdf_multi_o", "q_rdf_hop", "q_rdf_graph",
      "q_rdf_multi_graph", "q_rdf_regex", "q_rdf_regex_prop", "q_rdf_facet",
      "q_rdf_facet_properties", "q_rdf_facet_graphs", "q_rdf_agg_properties",
      "q_rdf_count_by_property", "q_rdf_total", "q_rdf_spo", "q_rdf_paths")
    // warm ctx
    SparkEntry.queries("q_rdf_filter_po")(spark, sfDir).count()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    for (aqe <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      var total = 0.0
      println(s"=== AQE=$aqe")
      for (n <- names) {
        val fn = SparkEntry.queries(n)
        fn(spark, sfDir).count()
        val times = Seq.fill(3) {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        Thread.sleep(50) // drain async listener delivery from the timed runs
        jobs.set(0)
        fn(spark, sfDir).count()
        Thread.sleep(50)
        total += times(1)
        println(f"[floor] $n%-26s ${times(1)}%.3f s  jobs=${jobs.get()}")
      }
      println(f"[floor] TOTAL AQE=$aqe: $total%.3f s")
    }
    spark.stop()
  }
}
