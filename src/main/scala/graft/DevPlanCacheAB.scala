package graft

import graft.algebra._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: interleaved A/B of the servingPlan cache on one query
  * shape (or-union) — same process, alternating runs, median of 11. */
object DevPlanCacheAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = graft.rdfize.Rdfize.ctx(spark, sfDir)
    import graft.rdfize.Rdfize.predIri
    def build(): DataFrame =
      QueryEngine.decoded(ctx,
          QueryEngine.subjects(ctx, QueryOpts(filters = Seq(
            FilterQ(p = predIri("customer", "c_mktsegment"), o = "\"BUILDING\""),
            FilterQ(p = predIri("customer", "c_mktsegment"), o = "\"AUTOMOBILE\"", op = "or")))).get
            .select(col("s").as("sh")), "sh", "s", inner = true)
        .select("s").coalesce(1).orderBy("s")
    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    build().count(); ctx.servingPlan("ab")(build()).count() // warm both
    val (as, bs) = (scala.collection.mutable.ArrayBuffer[Double](),
      scala.collection.mutable.ArrayBuffer[Double]())
    for (_ <- 1 to 11) {
      as += timed { build().count() }
      bs += timed { ctx.servingPlan("ab")(build()).count() }
    }
    println(f"[ab] uncached median ${as.sorted.apply(5)}%.4f  cached median ${bs.sorted.apply(5)}%.4f")
    spark.stop()
  }
}
