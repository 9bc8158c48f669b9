package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: per-run time split — DataFrame construction + Catalyst
  * analysis/optimization/physical planning vs actual execution — for the
  * rdf gate queries. If planning dominates, the fight is in plan-node
  * count, not the executed plan. */
object DevPlanSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_rdf_filter_p", "q_rdf_filter_po", "q_rdf_and",
      "q_rdf_hop", "q_rdf_facet_properties", "q_rdf_regex", "q_rdf_paths",
      "q_rdf_not")
    SparkEntry.queries("q_rdf_filter_po")(spark, sfDir).count()
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      val sp = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // force full planning
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        ((t1-t0)/1e9, (t2-t1)/1e9)
      }
      val plan = sp.map(_._1).sorted.apply(2)
      val exec = sp.map(_._2).sorted.apply(2)
      println(f"[split] $n%-26s plan=${plan}%.4f exec=${exec}%.4f")
    }
    spark.stop()
  }
}
