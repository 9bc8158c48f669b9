package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prints per-job stage descriptions for one gate query. */
object DevCacheProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val name = args.headOption.getOrElse("q3_join")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val stages = js.stageInfos.map(si => s"${si.name}(${si.numTasks}t)").mkString(" | ")
        println(s"[job] ${js.jobId}: $stages")
      }
    })
    val fn = SparkEntry.queries(name)
    fn(spark, dir).count()
    println("[probe] ---- steady-state run ----")
    fn(spark, dir).count()
    Thread.sleep(300)
  }
}
