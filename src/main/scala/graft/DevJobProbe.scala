package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one named gate query once (after a warm run) and print
  * every Spark job's call site — attributes a query's job count to the
  * exact actions in its chain. Not product surface.
  * Usage: runMain graft.DevJobProbe <sfDir> <query> */
object DevJobProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    // Bench's exact session so job attributions match bench job counts
    // (a hand-rolled local[32] here once hid a 2-job facet shape that
    // only appeared under Bench's local[4] plan stats)
    val spark = Bench.session()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm: populate caches, pay codegen
    Thread.sleep(300)
    @volatile var on = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (on) println(s"[job ${js.jobId}] " +
          js.stageInfos.map(si => s"${si.stageId}:${si.name}").mkString(" | "))
    })
    on = true
    fn(spark, sfDir).count()
    Thread.sleep(500)
    on = false
    spark.stop()
  }
}
