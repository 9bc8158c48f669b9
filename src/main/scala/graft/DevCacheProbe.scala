package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decomposes the n-gram pipeline ops (decontam, dup-spans,
  * top-ngrams) and times hashed-gram variants. Not product surface. */
object DevCacheProbe {
  private def time[A](label: String, n: Int = 5)(f: => A): A = {
    f
    var last: A = null.asInstanceOf[A]
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime(); last = f; (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[probe] $label%-46s median ${ts(n / 2)}%.3f s  (min ${ts.head}%.3f)")
    last
  }

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
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      .repartition(32).localCheckpoint(true)
    println(s"[probe] docs = ${d.count()}")

    def grams(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("id"),
        explode(graft.ops.TextAnalysis.wordGrams(col("text"), 8)).as("gram"))

    val g = grams(d)
    time("grams explode count")(g.count())
    time("grams explode + xxhash count")(g.select(col("id"), xxhash64(col("gram")).as("gh")).count())

    val bench = d.filter(col("doc_id") % 50 === 0)
    time("decontam current")(
      graft.ops.Decontam.contaminated(d, bench, "doc_id", "text", n = 8).count())
    def contamHashed(): Long = {
      val bg = grams(bench).select(xxhash64(col("gram")).as("gh")).distinct()
      g.select(col("id"), xxhash64(col("gram")).as("gh"))
        .join(broadcast(bg), "gh")
        .groupBy(col("id")).agg(count(lit(1)).as("hits"))
        .filter(col("hits") >= 1).count()
    }
    time("decontam hashed")(contamHashed())

    time("dup_spans current")(
      graft.ops.Decontam.dupSpanStats(d, "doc_id", "text", n = 8).count())
    def dupHashed(): Long = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gh"))
      g.select(col("id"), xxhash64(col("gram")).as("gh"))
        .withColumn("docfreq", count(lit(1)).over(w))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("docfreq") >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
        .count()
    }
    time("dup_spans hashed")(dupHashed())

    time("top_ngrams current")(
      graft.ops.TextAnalysis.topNgrams(d, "text", n = 2, k = 20).count())
  }
}
