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
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = graft.rdfize.Rdfize.ctx(spark, sfDir)
    val idx = ctx.fts.get
    println(s"[fts] lists partitions = ${idx.postingLists.rdd.getNumPartitions}")
    def time[A](label: String, n: Int = 5)(f: => A): A = {
      f
      var last: A = null.asInstanceOf[A]
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); last = f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[fts] $label%-40s median ${ts(n / 2)}%.3f s (min ${ts.head}%.3f)")
      last
    }
    time("matchBm25('red widget').count")(idx.matchBm25("red widget").count())
    time("lists pruned scan only")(
      idx.postingLists.filter(col("term").isin("red", "widget")).count())
    val opts = graft.algebra.QueryOpts(
      filters = Seq(graft.algebra.FilterQ(p = "fts", o = "red widget")))
    time("scoreChain count")(
      graft.algebra.QueryEngine.scoreChain(ctx, opts).get.count())
    val fn = RdfQueries.queries("q_rdf_fts_score")
    time("q_rdf_fts_score full")(fn(spark, sfDir).count())
    spark.stop()
  }
}
