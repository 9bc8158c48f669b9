package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: wall-time of the FTS index-build corpus text pass —
  * codegen FtsTokensExpr vs the Scala-UDF pipeline it replaced (same
  * analysis, same downstream aggregate). Not product surface.
  * Usage: runMain graft.DevFtsBuildTime [sfDir]
  */
object DevFtsBuildTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = graft.rdfize.Rdfize.ctx(spark, sfDir)
    val docs = ctx.graph.literals.select(col("hash"), col("value"))
    val n = docs.count()
    println(s"[ftsbuild] literals rows = $n")
    val st = graft.fts.FtsSettings.resolve()
    def pass(label: String, tokens: org.apache.spark.sql.Column): Unit = {
      // the index build's corpus pass: tokenize + explode + tf groupBy
      def run(): Long = docs
        .select(col("hash"), tokens.as("tokens"))
        .withColumn("len", size(col("tokens")))
        .select(col("hash"), col("len"), explode(col("tokens")).as("term"))
        .groupBy("hash", "term")
        .agg(count(lit(1)).as("tf"))
        .agg(count(lit(1))).collect()(0).getLong(0)
      run() // warm
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[ftsbuild] $label median = ${times.sorted.apply(2)}%.3f s (${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    val tokenizeUdf = udf((s: String) => st.indexTokens(s))
    pass("scala-udf", tokenizeUdf(col("value")))
    pass("codegen  ", graft.functions.FtsTokensExpr(col("value"), st))
    // the shipped plan: row-local tf (no groupBy shuffle at all)
    def runLocal(): Long = docs
      .select(col("hash"),
        graft.functions.FtsTokenCountsExpr(col("value"), st).as("a"))
      .select(col("hash"), col("a.len").as("len"), explode(col("a.terms")).as("t"))
      .select(col("hash"), col("t.term").as("term"), col("t.tf").as("tf"), col("len"))
      .agg(count(lit(1))).collect()(0).getLong(0)
    runLocal()
    val times = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); runLocal(); (System.nanoTime() - t0) / 1e9
    }
    println(f"[ftsbuild] row-local tf median = ${times.sorted.apply(2)}%.3f s (${times.map(t => f"$t%.3f").mkString(", ")})")
    spark.stop()
  }
}
