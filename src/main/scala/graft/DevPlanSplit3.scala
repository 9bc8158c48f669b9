package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: top Catalyst rules by cumulative time over repeated gate
  * query planning (RuleExecutor metrics). */
object DevPlanSplit3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_rdf_filter_p", "q_rdf_filter_po", "q_rdf_and",
      "q_rdf_facet_properties", "q_rdf_regex", "q_rdf_not")
    for (n <- names) { val fn = SparkEntry.queries(n); fn(spark, sfDir).count() }
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    for (_ <- 1 to 5; n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.executedPlan
    }
    val dump = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
    println(dump.split("\n").take(40).mkString("\n"))
    spark.stop()
  }
}
