package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algebra.{FilterCompiler, QueryEngine}
import graft.rdfize.Rdfize

/** Dev tool: times candidate plan shapes for the subject-set family
  * (distinct + order-by-decoded-value) and the facet semi-join, to decide
  * whether deferring the distinct / fusing it with the sort exchange is
  * worth engine surgery. Not part of the product surface.
  *
  * Usage: runMain graft.DevPlanProbe /root/testdata/sf0.1
  */
object DevPlanProbe {
  private def time[A](label: String, n: Int = 5)(f: => A): Unit = {
    f // warm
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[probe] $label%-34s median ${ts(n / 2)}%.3f s  (min ${ts.head}%.3f max ${ts.last}%.3f)")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = Rdfize.ctx(spark, args.headOption.getOrElse("/root/testdata/sf0.1"))
    val t = ctx.graph.triples
    val pParent = FilterCompiler.h(Rdfize.ParentIri)
    val pNName = FilterCompiler.h(Rdfize.predIri("nation", "n_name"))
    def dec(c: org.apache.spark.sql.Column) = ctx.decodeExpr(c).get

    println(s"[probe] triples cache partitions = ${t.rdd.getNumPartitions}")
    time("t.count (cached scan)")(t.count())

    // ---- subject-set family: filter p → distinct s → decode → sort(value)
    val filt = t.filter(col("p") === pParent).select("s")
    time("filt.count (scan+filter)")(filt.count())
    time("filt.distinct.count")(filt.distinct().count())

    def shapeA(): Long = // current: hash-distinct then global sort on value
      filt.distinct().select(dec(col("s")).as("v")).orderBy("v").count()

    def shapeB(): Long = // fused: range exchange on value, dedup + sort within
      filt.select(col("s"), dec(col("s")).as("v"))
        .repartitionByRange(col("v"))
        .dropDuplicates("s")
        .sortWithinPartitions("v")
        .select("v").count()

    def shapeC(): Long = // dedup map-side only via partial agg? (approx: local dedup then global)
      filt.select(dec(col("s")).as("v")).distinct().orderBy("v").count()

    time("A filter-distinct-sort (current)")(shapeA())
    time("B range-fused one-exchange")(shapeB())
    time("C decode-first distinct")(shapeC())
    println("--- explain B ---")
    filt.select(col("s"), dec(col("s")).as("v"))
      .repartitionByRange(col("v")).dropDuplicates("s")
      .sortWithinPartitions("v").select("v").explain("formatted")

    // ---- facet: subject semi-join with vs without subject-side distinct
    val subjDistinct = t.filter(col("p") === pNName).select("s").distinct()
    val subjRaw = t.filter(col("p") === pNName).select("s")

    def facet(subj: DataFrame): Array[org.apache.spark.sql.Row] =
      t.join(subj, Seq("s"), "left_semi")
        .groupBy(col("p")).agg(count(lit(1)).as("count"))
        .select(col("count"), dec(col("p")).as("val"))
        .orderBy("val").collect()

    time("facet with distinct (current)")(facet(subjDistinct))
    time("facet without distinct")(facet(subjRaw))

    // ---- in-filter alternative for small subject sets: collect + isin
    def facetIsin(): Array[org.apache.spark.sql.Row] = {
      val ss = subjRaw.distinct().as[Long](spark.implicits.newLongEncoder).collect()
      t.filter(col("s").isin(ss: _*))
        .groupBy(col("p")).agg(count(lit(1)).as("count"))
        .select(col("count"), dec(col("p")).as("val"))
        .orderBy("val").collect()
    }
    time("facet collect+isin")(facetIsin())

    spark.stop()
  }
}
