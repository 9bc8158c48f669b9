package graft.algebra

import graft.functions.Hash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subject ordering (reference `_order_build_sorted_table`,
  * query.py:316-465): resolve a per-subject sort label via
  * label / arbitrary property / label-of-referenced-object, pick the best
  * label by language preference with a min_by hash aggregate, clean it, optionally
  * extract a numeric prefix for natural sort, and emit the total order.
  */
object Ordering {

  val RdfsLabelIri = "<http://www.w3.org/2000/01/rdf-schema#label>"

  /** Language-preference rank (query.py:245-258): listed langs in order,
    * then untagged literals, then everything else. */
  private def langRank(value: Column, langs: Seq[String]): Column = {
    var rank = 1
    var expr: Column = null
    for (lg <- langs) {
      val cond = value.like("%\"@" + lg)
      expr = if (expr == null) when(cond, rank) else expr.when(cond, rank)
      rank += 1
    }
    val untagged = value.like("%\"@%").unary_!
    expr = if (expr == null) when(untagged, rank) else expr.when(untagged, rank)
    expr.otherwise(rank + 1)
  }

  /** Cleaning chain (query.py:261-285), same application order.
    * Reference parity note: the reference's
    * `regexp_replace` runs in DuckDB WITHOUT the 'g' option, i.e.
    * FIRST-match-only — remove_quotes strips one quote (the leading one
    * if present, else a trailing one) and collapse_space collapses only
    * the first whitespace run. Spark's regexp_replace is global, so the
    * first-match behaviors are emulated explicitly; strip_punct's
    * anchored pattern can only match once, so global == first there. */
  private[graft] def cleanExpr(base: Column, clean: CleanOpts, mode: String): Column = {
    var e = base
    if (clean.removeQuotes)
      e = when(e.startsWith("\""), e.substr(lit(2), length(e)))
        .otherwise(when(e.endsWith("\""), e.substr(lit(1), length(e) - 1))
          .otherwise(e))
    if (clean.collapseSpace)
      e = regexp_replace(e, "^(\\S*)\\s+", "$1 ")
    if (clean.stripPunct) e = regexp_replace(e, "^[^0-9A-Za-z]+", "")
    if (clean.trim) e = trim(e)
    if (mode == "lex" && clean.lower) e = lower(e)
    e
  }

  /** Returns (labeled subjects DataFrame with columns
    * s, sort_label [, num_prefix], ordering columns). The DataFrame covers
    * every subject of `sResults` (left join — unlabeled subjects sort per
    * the nulls rule). */
  def sortedSubjects(ctx: EngineContext, sResults: DataFrame, rule: OrderRule): (DataFrame, Seq[Column]) = {
    val triples = ctx.graph.triples
    val literals = ctx.graph.literals

    val labelSource: DataFrame = rule.by match {
      case "label" | "property" =>
        val propIri = if (rule.by == "label") RdfsLabelIri
          else rule.prop.getOrElse(
            throw new IllegalArgumentException("order.by='property' requires 'prop' (IRI)."))
        sResults.as("S")
          .join(triples.as("T"),
            col("T.s") === col("S.s") && col("T.p") === Hash64.hashString(propIri))
          .join(literals.as("L"), col("L.hash") === col("T.o"))
          .select(col("S.s").as("s"), col("L.value").as("lbl_val"))
      case "object_label" =>
        val viaIri = rule.via.getOrElse(
          throw new IllegalArgumentException("order.by='object_label' requires 'via' (IRI)."))
        sResults.as("S")
          .join(triples.as("T1"),
            col("T1.s") === col("S.s") && col("T1.p") === Hash64.hashString(viaIri))
          .join(triples.as("T2"),
            col("T2.s") === col("T1.o") && col("T2.p") === Hash64.hashString(RdfsLabelIri))
          .join(literals.as("L"), col("L.hash") === col("T2.o"))
          .select(col("S.s").as("s"), col("L.value").as("lbl_val"))
      case other =>
        throw new IllegalArgumentException(s"Unsupported order.by='$other'")
    }

    val rawText = regexp_extract(col("lbl_val"), "^\"(.+)\"", 1)
    val labeled = labelSource
      .withColumn("lang_rank", langRank(col("lbl_val"), rule.lang))
      .withColumn("sort_label", cleanExpr(rawText, rule.cleanOrDefault, rule.mode))
    // best label per subject = min by (lang_rank, sort_label): a hash
    // aggregate with map-side combine (struct ordering is lexicographic),
    // where the reference's row_number window would sort every partition.
    // Ties are exact duplicates of the pair, so the pick is identical.
    val pref = labeled
      .groupBy(col("s"))
      .agg(min_by(col("sort_label"),
        struct(col("lang_rank"), col("sort_label"))).as("sort_label"))

    val dirCol: Column => Column =
      if (rule.dir == "desc") (c: Column) => c.desc_nulls_last else (c: Column) => c.asc_nulls_last

    if (rule.natural) {
      val numbered = pref.withColumn("num_prefix",
        expr("try_cast(nullif(regexp_extract(sort_label, '^(\\\\d+)', 1), '') AS INTEGER)"))
      val joined = sResults.as("S").join(numbered.as("N"), col("N.s") === col("S.s"), "left")
        .select(col("S.s").as("s"), col("N.sort_label").as("sort_label"),
          col("N.num_prefix").as("num_prefix"))
      val orderCols = Seq(
        col("sort_label").isNull.asc,
        col("num_prefix").isNull.asc,
        dirCol(col("num_prefix")),
        dirCol(col("sort_label")),
        col("s").asc)
      (joined, orderCols)
    } else {
      val joined = sResults.as("S").join(pref.as("P"), col("P.s") === col("S.s"), "left")
        .select(col("S.s").as("s"), col("P.sort_label").as("sort_label"))
      val nullsCol =
        if (rule.nulls == "first") col("sort_label").isNull.desc
        else col("sort_label").isNull.asc
      val orderCols = Seq(nullsCol, dirCol(col("sort_label")), col("s").asc)
      (joined, orderCols)
    }
  }
}
