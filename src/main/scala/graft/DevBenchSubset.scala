package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: Bench's exact timing protocol (1 untimed codegen run, then
  * median of 5) over a named subset of queries — fast iteration on
  * individual plans without the full 85-query sweep. Not product surface.
  * Usage: runMain graft.DevBenchSubset <sfDir> <query1> [query2 ...] */
object DevBenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local-mode scan parallelism: the testdata tables are single
      // small parquet files, and the default 4 MB file-open cost floors
      // maxSplitBytes so a 2 MB table scans as ONE task (the partial
      // aggregate then runs single-threaded while DuckDB splits by row
      // group). 128 KB lets bytes/parallelism drive the split; cluster
      // deployments keep the default (many-file inputs split by file)
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCounter.incrementAndGet(); ()
      }
    })
    try SparkEntry.warmup(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[subset] warmup failed: $e") }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count()
      val j0 = jobCounter.get()
      val times = Seq.fill(5) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val jobs = (jobCounter.get() - j0) / 5
      println(f"[subset] $name%-28s median ${times(2)}%.3f s  (min ${times.head}%.3f max ${times.last}%.3f) jobs/run $jobs")
    }
    PipelineQueries.clearCaches()
    spark.stop()
  }
}
