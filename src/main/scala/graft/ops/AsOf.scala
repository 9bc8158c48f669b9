package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range (interval-band) joins — the two time-series join
  * shapes Spark's optimizer has no native operator for (the reference
  * delegates join strategy entirely to DuckDB, SURVEY §2.3; these are
  * pipeline additions in the spirit of DuckDB's `ASOF JOIN`).
  *
  * Both are built from shuffle-bounded compositions, never per-row
  * range probes:
  *
  * - [[asofJoin]] is the UNION-TAG-WINDOW shape: tag both inputs,
  *   union them, and carry the most recent right-side row forward with
  *   ONE window per key ordered by (ts, tag) — a single shuffle on the
  *   join key, the same cost as any windowed aggregate, regardless of
  *   how many right rows precede each left row. The naive alternative
  *   (theta-join on `r.ts <= l.ts` + argmax) is a per-key cross
  *   product.
  * - [[rangeSelfPairs]] is the BUCKET-AND-VERIFY shape: quantize time
  *   into band-width buckets, equi-join on (key, bucket ± 1), then
  *   verify the exact band predicate — candidates are bounded by true
  *   temporal neighbors, the equi-join shuffles on (key, bucket) like
  *   any hash join, and no interval comparison ever runs outside a
  *   candidate bucket pair.
  */
object AsOf {

  /** Left as-of join: for every left row, the single most recent right
    * row with `right.tsCol <= left.tsCol` in the same key group (ties
    * at equal ts match — DuckDB `ASOF LEFT JOIN ... ON l.ts >= r.ts`
    * semantics). Right rows that share (key, ts) must be pre-deduped
    * by the caller (the operator cannot know which duplicate should
    * win); unmatched left rows keep null right columns.
    *
    * `rightCols` are carried as ONE struct through the window, so the
    * matched values always come from the SAME right row even when some
    * of them are null. Output = every left column, plus `rightCols`
    * (null when no right row precedes). With `toleranceSeconds`, a
    * match staler than the bound is rejected (nulls, as if no right
    * row preceded) — the standard max-staleness as-of shape; the
    * matched right ts rides the same struct, so the check cannot pair
    * a gap with the wrong row. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightCols: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    require(rightCols.nonEmpty, "asofJoin needs at least one right value column")
    val leftPayload = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    // common shape: keys, ts, tag (right=0 < left=1 so an equal-ts right
    // row sorts FIRST and is visible to the left row), left payload,
    // right struct
    toleranceSeconds.foreach(t =>
      require(t > 0, s"tolerance must be positive, got $t"))
    val taggedRight = right.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(0).as("__tag")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        // the matched row's ts rides the struct so the staleness check
        // reads the SAME row the values came from
        Seq(struct((rightCols.map(col) :+
          col(tsCol).cast("long").as("__rts")): _*).as("__r")): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(1).as("__tag")) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(taggedRight.schema("__r").dataType).as("__r")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val gated = toleranceSeconds match {
      case Some(t) => carried.withColumn("__m",
        when(col(tsCol).cast("long") - col("__m").getField("__rts") <= t,
          col("__m")))
      case None => carried
    }
    gated.filter(col("__tag") === 1)
      .select(keyCols.map(col) ++ Seq(col(tsCol)) ++ leftPayload.map(col) ++
        rightCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Temporal band self-pairs: all ordered pairs of rows in the same
    * key group whose timestamps lie within `bandSeconds` of each other
    * (`0 < t2 − t1 <= band`, so a row never pairs with itself and each
    * unordered pair appears once, earlier row first; equal-ts rows pair
    * by id order). Returns the two id columns, both timestamps, and
    * `gap_s` = epoch(ts_b) − epoch(ts_a) in integer seconds — a caller
    * that reads only the gap lets column pruning drop the raw
    * timestamps from the join entirely (guide §2.3: the verify columns
    * are the epoch longs; the timestamps are presentation).
    *
    * Candidates come from quantizing ts into band-width buckets and
    * equi-joining on (key, bucket) ∪ (key, bucket+1) — any pair within
    * the band shares a bucket or sits in adjacent ones, so the prune is
    * LOSSLESS, and a key's cost is its true neighbor count, not its
    * row count squared. */
  def rangeSelfPairs(df: DataFrame, keyCols: Seq[String], tsCol: String,
      idCol: String, bandSeconds: Long): DataFrame = {
    require(bandSeconds > 0, s"band must be positive, got $bandSeconds")
    val epoch = col(tsCol).cast("long")
    val base = df.select(
      keyCols.map(col) ++ Seq(col(idCol), col(tsCol), epoch.as("__sec"),
        floor(epoch / bandSeconds).as("__b")): _*)
    // left side probes its own bucket and the next one; the right side
    // stays single-bucket, so each candidate pair is generated once
    val probe = base.select(
        keyCols.map(col) ++ Seq(col(idCol), col(tsCol), col("__sec"),
          explode(array(col("__b"), col("__b") + 1)).as("__b")): _*)
      .withColumnRenamed(idCol, "a").withColumnRenamed(tsCol, "ts_a")
      .withColumnRenamed("__sec", "__sa")
    val build = base
      .withColumnRenamed(idCol, "b").withColumnRenamed(tsCol, "ts_b")
      .withColumnRenamed("__sec", "__sb")
    probe.join(build, keyCols :+ "__b")
      .filter(
        (col("__sb") > col("__sa") && col("__sb") - col("__sa") <= bandSeconds) ||
        (col("__sb") === col("__sa") && col("b") > col("a")))
      .select(keyCols.map(col) ++
        Seq(col("a"), col("b"), col("ts_a"), col("ts_b"),
          (col("__sb") - col("__sa")).as("gap_s")): _*)
  }
}
