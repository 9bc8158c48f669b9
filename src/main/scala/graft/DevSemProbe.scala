package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: ANN probe stats + stage timing for the semantic filter. */
object DevSemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = graft.rdfize.Rdfize.semantic(spark, sfDir)
    val ann = ctx.semanticAnn.get
    val q = ctx.embedder.embedOne("NATION_3 NATION_3")
    val probe = ann.probeCells(q, 0.5)
    println(s"[probe] cells=${ann.centroids.length} probed=${probe.size} radii=${ann.radii.map(r => f"$r%.2f").mkString(",")}")
    val total = ann.cells.count()
    val cand = ann.candidates(q, 0.5).count()
    println(s"[probe] corpus=$total candidates=$cand")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val scored = ann.candidates(q, 0.5)
        .withColumn("distance", graft.functions.CosineDistance(
          org.apache.spark.sql.functions.col("vec"),
          org.apache.spark.sql.functions.lit(q)))
        .filter(org.apache.spark.sql.functions.col("distance") < 0.5)
      val n = scored.count()
      println(f"[probe] scan+rescore run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n matches")
    }

    // full-query stage timing
    import graft.algebra._
    val opts = QueryOpts(filters = Seq(FilterQ(p = "semantic", o = "NATION_3 NATION_3")), size = 10)
    for (i <- 1 to 2) {
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"[stage] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); t0 = System.nanoTime()
      }
      val compiled = opts.filters.flatMap { f =>
        FilterCompiler.compile(ctx, f, withScore = true).map(f -> _) }
      val scoring = compiled.collect { case (f, df) => df.persist() }
      val sResults = QueryEngine.subjectsFromCompiled(compiled).get.persist()
      val total = sResults.count(); lap(s"run$i subjects count=$total")
      val sByScore = QueryEngine.scoreChainFromCompiled(compiled)
      val wanted = QueryEngine.wantedPage(ctx, opts, sResults, sByScore).persist()
      wanted.count(); lap(s"run$i wantedPage")
      val pageRows = QueryEngine.hydrate(ctx, opts, wanted).collect()
      lap(s"run$i hydrate rows=${pageRows.length}")
      wanted.unpersist(); sResults.unpersist(); scoring.foreach(_.unpersist())
    }
    spark.stop()
  }
}
