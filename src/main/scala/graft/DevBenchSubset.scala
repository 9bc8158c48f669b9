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
    // Bench's exact session (local[SPARK_GRAFT_CPUS], same knobs) so
    // subset medians and job counts are comparable to bench numbers
    val spark = Bench.session()
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
