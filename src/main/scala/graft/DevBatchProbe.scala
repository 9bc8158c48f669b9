package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: cache batchSize sweep over BOTH scan classes — selective
  * point lookups (want batch-stat pruning) and wide aggregate scans
  * (want few batches). */
object DevBatchProbe {
  def time(label: String, n: Int = 9)(f: => Long): Unit = {
    f
    val ts = (1 to n).map { _ => val t0 = System.nanoTime(); val r = f; ((System.nanoTime()-t0)/1e9, r) }
    println(f"[probe] $label%-44s ${ts.map(_._1).sorted.apply(n/2)}%.4f s (rows=${ts.head._2})")
  }
  def main(args: Array[String]): Unit = {
    val spark = Bench.session()
    spark.sparkContext.setLogLevel("WARN")
    val ph = graft.functions.Hash64.hashString(graft.rdfize.Rdfize.ParentIri)
    val lh = graft.functions.Hash64.hashString("<http://www.w3.org/2000/01/rdf-schema#label>")
    val nh = graft.functions.Hash64.hashString("\"NATION_3\"")
    val wh = "/tmp/graft_rdfize_cache/_root_testdata_sf0.1_v3"
    val raw = spark.read.parquet(wh + "/triples")
    def pinned(np: Int): DataFrame =
      raw.coalesce(1).repartition(np, col("p")).sortWithinPartitions("p", "o", "s")
    for (bs <- Seq("10000", "65536", "262144", "1048576"); round <- 1 to 2) {
      spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", bs)
      val t = pinned(3).persist(); t.count()
      time(s"bs=$bs r$round spo point (p=label,o=NATION_3)") {
        t.filter(col("p") === lh && col("o") === nh).count() }
      time(s"bs=$bs r$round p-distinct") {
        t.filter(col("p") === ph).select("s").distinct().count() }
      time(s"bs=$bs r$round full count") { t.count() }
      t.unpersist(true)
    }
    spark.stop()
  }
}
