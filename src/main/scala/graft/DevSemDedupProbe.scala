package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev scratch: semDedup wall time pinned-vs-derived cell count — the
  * measurement behind SCALE.md's "fixed target cell size keeps the
  * pairwise pass linear in the corpus" row. */
object DevSemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding", "label")
    val n = emb.count()
    for (lists <- Seq(16, 0); rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val kept = graft.ops.Similarity.semDedupKeep(emb, "vec_id", "embedding",
        threshold = 0.45, nLists = lists, knownCount = Some(n)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val eff = if (lists > 0) lists else math.max(1L, n / 2048L)
      println(f"[semdedup] n=$n cells=$eff%4d (nLists=$lists) rep=$rep kept=$kept  $sec%.2f s")
    }
    spark.stop()
  }
}
