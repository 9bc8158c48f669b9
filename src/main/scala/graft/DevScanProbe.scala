package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the p-filter subject-set shape
  * (scan → distinct → decode → sort) on the sf0.1 warehouse cache, at
  * the serving partition layout. Isolates which stage carries the
  * engine-vs-DuckDB gap. */
object DevScanProbe {
  def time(label: String, n: Int = 5)(f: => Long): Unit = {
    f // warm
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val med = ts.map(_._1).sorted.apply(n / 2)
    println(f"[probe] $label%-42s ${med}%.4f s  (rows=${ts.head._2})")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session()
    spark.sparkContext.setLogLevel("WARN")
    val ctx0 = graft.rdfize.Rdfize.ctx(spark, dir)
    val ctx = ctx0
    val t = ctx.graph.triples
    val ph = graft.functions.Hash64.hashString(graft.rdfize.Rdfize.ParentIri)
    println(s"[probe] triples partitions = ${t.rdd.getNumPartitions}")

    time("full scan count(*)") { t.count() }
    time("scan+filter p count") { t.filter(col("p") === ph).count() }
    time("scan+filter p distinct count") {
      t.filter(col("p") === ph).select("s").distinct().count()
    }
    val sSet = t.filter(col("p") === ph).select("s")
    time("distinct collect (16k)") { sSet.distinct().collect().length.toLong }
    val dec = graft.algebra.QueryEngine.decoded(
      ctx, sSet.distinct().select(col("s").as("sh")), "sh", "s", inner = true)
    time("decode collect") { dec.collect().length.toLong }
    time("decode+coalesce1+sort collect") {
      dec.select("s").coalesce(1).orderBy("s").collect().length.toLong
    }
    // partition-count sweep on the raw parquet (fresh cache each)
    for (np <- Seq(3, 8, 16, 32)) {
      val re = t.coalesce(1).repartition(np, col("p"))
        .sortWithinPartitions("p", "o", "s").persist()
      re.count()
      time(s"scan+filter p distinct count @$np") {
        re.filter(col("p") === ph).select("s").distinct().count()
      }
      re.unpersist()
    }
    spark.stop()
  }
}
