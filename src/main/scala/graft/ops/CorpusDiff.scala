package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-version diff — the dataset-versioning primitive: given two
  * snapshots of a keyed corpus, classify every key as added / removed /
  * changed / unchanged by CONTENT (md5 of the text, so the comparison
  * is engine-replayable and never ships the text through the join).
  *
  * ONE full-outer hash join on the key — the same shuffle any keyed
  * reconciliation pays; both sides project to (key, 16-byte hash)
  * before the exchange, so shuffle volume is key-table-sized at any
  * corpus size. Presence is tracked with explicit flags, not hash
  * nullity, so a present row with NULL text still diffs correctly
  * (null text hashes like empty — a null→'' edit therefore reads
  * `unchanged`; key presence is what added/removed mean). */
object CorpusDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def side(df: DataFrame, p: String) =
      df.select(col(idCol), lit(true).as(s"__p$p"),
        md5(coalesce(col(textCol), lit(""))).as(s"__h$p"))
    side(oldDf, "o").join(side(newDf, "n"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__po").isNull, lit("added"))
          .when(col("__pn").isNull, lit("removed"))
          .when(col("__ho") === col("__hn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The one-row roll-up a versioning report leads with. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy()
      .pivot("status", Seq("added", "removed", "changed", "unchanged"))
      .agg(count(lit(1)))
      .na.fill(0L)
}
