package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage timing for the FTS score-chain path. */
object DevFtsProbe {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size); ()
      }
    })
    val ctx = graft.rdfize.Rdfize.ctx(spark, sfDir)
    val idx = ctx.fts.get
    println(s"[fts] lists partitions = ${idx.postingLists.rdd.getNumPartitions}")
    def time[A](label: String, n: Int = 5)(f: => A): A = {
      f
      var last: A = null.asInstanceOf[A]
      val j0 = jobs.get(); val s0 = stages.get()
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); last = f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[fts] $label%-40s median ${ts(n / 2)}%.3f s (min ${ts.head}%.3f) jobs/run ${(jobs.get() - j0) / n} stages/run ${(stages.get() - s0) / n}")
      last
    }
    time("matchBm25('red widget').count")(idx.matchBm25("red widget").count())
    time("lists pruned scan only")(
      idx.postingLists.filter(col("term").isin("red", "widget")).count())

    // variant: single-partition window (no exchange before window/groupBy)
    def matchCoalesced(): Long = {
      val terms = Seq("red", "widget")
      val pruned = idx.postingLists
        .filter(col("term").isin(terms: _*)).coalesce(1)
      val n = idx.numDocs.toDouble
      val dfCol = sum(size(col("plist")))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("term")))
      val idf = log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      pruned
        .withColumn("df", dfCol)
        .withColumn("idf", idf)
        .select(col("term"), col("idf"), explode(col("plist")).as("e"))
        .select(col("term"), col("idf"), col("e.hash").as("hash"),
          col("e.tf").as("tf"), col("e.len").as("len"))
        .withColumn("subscore",
          col("idf") * (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("len") / lit(idx.avgdl))))
        .groupBy(col("hash"))
        .agg(countDistinct(col("term")).as("nmatch"), sum(col("subscore")).as("score"))
        .filter(col("nmatch") === 2)
        .count()
    }
    time("matchBm25 coalesce(1) variant")(matchCoalesced())

    val opts = graft.algebra.QueryOpts(
      filters = Seq(graft.algebra.FilterQ(p = "fts", o = "red widget")))
    time("scoreChain count")(
      graft.algebra.QueryEngine.scoreChain(ctx, opts).get.count())

    // variant: collect the scored set once, rebuild a local frame, then
    // o-IN pruned scan + broadcast-join the local frame for the score
    def probeScore(): Long = {
      val rows = idx.matchBm25("red widget").collect()
      val local = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("mhash",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType))))
      val hashes = rows.map(_.getLong(0)).toIndexedSeq
      val t0 = ctx.graph.triples.filter(col("o").isin(hashes: _*))
        .join(broadcast(local), col("o") === col("mhash"))
        .select(col("s"), col("score"))
        .groupBy("s").agg(max("score").as("score"))
      graft.algebra.QueryEngine.decoded(ctx,
        t0.select(col("s").as("sh"), col("score")), "sh", "s", inner = true)
        .select("s").orderBy("s").count()
    }
    time("probe-materialized score full")(probeScore())

    val fn = RdfQueries.queries("q_rdf_fts_score")
    time("q_rdf_fts_score full")(fn(spark, sfDir).count())
    spark.stop()
  }
}
