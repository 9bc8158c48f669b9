package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: Catalyst phase breakdown (parsing/analysis/optimization/
  * planning) per gate query via QueryPlanningTracker. */
object DevPlanSplit2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_rdf_filter_p", "q_rdf_filter_po", "q_rdf_and",
      "q_rdf_facet_properties", "q_rdf_regex", "q_rdf_not")
    SparkEntry.queries("q_rdf_filter_po")(spark, sfDir).count()
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count()
      // median-of-5 phase times
      val runs = (1 to 5).map { _ =>
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan
        df.queryExecution.tracker.phases.map { case (k, v) =>
          k -> (v.endTimeMs - v.startTimeMs)
        }
      }
      val keys = runs.flatMap(_.keys).distinct
      val med = keys.map { k =>
        val vs = runs.map(_.getOrElse(k, 0L)).sorted
        s"$k=${vs(2)}ms"
      }.mkString(" ")
      println(s"[phases] $n $med")
    }
    spark.stop()
  }
}
