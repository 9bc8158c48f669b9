package graft

import org.apache.spark.sql.SparkSession

object DevKeepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        log.add(s"job ${j.jobId}: " + j.stageInfos.map(si => si.name.takeWhile(_ != '\n')).mkString(" / "))
        ()
      }
    })
    val fn = SparkEntry.queries("q_emb_dedup_keep")
    fn(spark, sfDir).count()
    log.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    println(f"[keep] total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    log.forEach(s => println(s"[keep] $s"))
    spark.stop()
  }
}
