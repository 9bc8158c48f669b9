package graft.ingest

import graft.store.Graph
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Export the warehouse back to N-Triples / TriG text — the inverse of
  * [[Build]] (the reference has no export path; a migrating user needs
  * one to leave, back up, or hand data to another tool).
  *
  * Terms decode through the dictionaries (one join per position — late
  * materialization until the text sink). Named-graph triples serialize
  * as TriG blocks (`<g> {` … `}`), BECAUSE that is the only graph
  * syntax the reference's `read_nt` — and our parity parser — accepts
  * (a 4th N-Quads token would be swallowed into the object). Graph
  * state makes TriG inherently order-dependent, so a store containing
  * named graphs always exports as ONE ordered file; a pure
  * default-graph store exports as order-free parallel .nt parts unless
  * `singleFile` is set.
  */
object Export {

  /** Decoded (s, p, o, g) surface strings; g is null for the default
    * graph (whose name is not decodable — Build quirk parity). */
  def decodedQuads(graph: Graph): DataFrame = {
    val dict = graph.dict
    def dec(c: String) = {
      val d = dict.withColumnRenamed("hash", s"__h_$c").withColumnRenamed("value", s"${c}_str")
      (df: DataFrame) => df.join(d, col(c) === col(s"__h_$c"), "left").drop(s"__h_$c")
    }
    Seq("s", "p", "o", "g").map(dec).foldLeft(graph.triples)((df, f) => f(df))
      .select(col("s_str").as("s"), col("p_str").as("p"),
        col("o_str").as("o"), col("g_str").as("g"))
  }

  /** Ordered TriG lines: default-graph triples first, then one block per
    * named graph. `gkey`/`ord` are the sort keys. */
  private def trigLines(q: DataFrame): DataFrame = {
    val triple = concat(concat_ws(" ", col("s"), col("p"), col("o")), lit(" ."))
    val defaults = q.filter(col("g").isNull)
      .select(lit("").as("gkey"), lit(1).as("ord"), triple.as("line"))
    val named = q.filter(col("g").isNotNull)
      .select(col("g").as("gkey"), lit(1).as("ord"), triple.as("line"))
    val opens = q.filter(col("g").isNotNull).select(col("g")).distinct()
      .select(col("g").as("gkey"), lit(0).as("ord"), concat(col("g"), lit(" {")).as("line"))
    val closes = q.filter(col("g").isNotNull).select(col("g")).distinct()
      .select(col("g").as("gkey"), lit(2).as("ord"), lit("}").as("line"))
    defaults.unionByName(named).unionByName(opens).unionByName(closes)
  }

  /** Write the graph as N-Triples/TriG text under `path`. Returns the
    * number of data lines written. */
  def nt(graph: Graph, path: String, singleFile: Boolean = false): Long = {
    val q = decodedQuads(graph).persist()
    try {
      val hasNamed = q.filter(col("g").isNotNull).limit(1).count() > 0
      if (hasNamed || singleFile)
        trigLines(q)
          .coalesce(1).sortWithinPartitions("gkey", "ord", "line")
          .select("line")
          .write.mode(SaveMode.Overwrite).text(path)
      else
        q.select(concat(concat_ws(" ", col("s"), col("p"), col("o")), lit(" .")).as("line"))
          .write.mode(SaveMode.Overwrite).text(path)
      q.count()
    } finally q.unpersist()
  }
}
