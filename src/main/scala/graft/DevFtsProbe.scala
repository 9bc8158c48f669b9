package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage timing for the FTS filter path. */
object DevFtsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = graft.rdfize.Rdfize.ctx(spark, sfDir)
    val idx = ctx.fts.get
    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"[fts] run$i $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
      }
      val m = idx.matchBm25("machinery")
      val nMatch = m.count(); lap(s"matchBm25 count=$nMatch")
      val t1 = ctx.graph.triples
        .join(broadcast(m.withColumnRenamed("hash", "mhash")), col("o") === col("mhash"))
        .select("s")
      val nJoin = t1.count(); lap(s"triples join count=$nJoin")
      val nDistinct = t1.distinct().count(); lap(s"distinct count=$nDistinct")
    }
    spark.stop()
  }
}
