package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression operators: int8 scalar quantization and
  * per-label centroids — the storage/serving side of a vector pipeline
  * (a 100 TB embedding store ships int8 + a scale, not float32; IVF
  * coarse quantizers and k-means label summaries need exact centroid
  * math).
  *
  * Quantization is per-row (transform/aggregate column expressions, no
  * shuffle, no UDF). Centroids are one posexplode + one groupBy(label,
  * dim) — the aggregate runs map-side-combined on integer e4 units
  * (round(x·10⁴) as BIGINT), so the sum is exact and associative: the
  * result is bit-identical on any partitioning/any engine, unlike a
  * double sum whose value depends on add order.
  */
object Quantize {

  /** Symmetric int8 quantization of a float vector: scale = max |x|,
    * q_i = clamp(⌊x_i/scale·127 + 0.5⌋, −127, 127); a zero vector
    * quantizes to all zeros. `floor(x + 0.5)` (round-half-toward-+∞) is
    * used instead of engine `round` so the boundary behavior is
    * identical everywhere. Output: id, scale_e6 (scale in 10⁻⁶ units as
    * BIGINT — integer-exact, no decimal-rendering channel), qsum (sum of
    * the int8 codes — the exact checksum an oracle can reproduce), n_sat
    * (components at FULL SCALE, |code| = 127 — under max-abs scaling the
    * clamp never actually engages, so this is ≥ 1 for any nonzero vector
    * and reads as "how concentrated is the vector's energy", not as a
    * clipping alarm; the clamp stays as defense for a future
    * percentile-scale variant where clipping is real). */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val scale = array_max(transform(v, x => abs(x)))
    val q = transform(v, x =>
      when(scale === 0.0, lit(0L)).otherwise(
        greatest(lit(-127L), least(lit(127L),
          floor(x / scale * 127.0 + 0.5).cast("long")))))
    df.select(col(idCol),
      round(scale * 1000000.0).cast("long").as("scale_e6"),
      aggregate(q, lit(0L), (a, b) => a + b).as("qsum"),
      size(filter(q, c => abs(c) === 127L)).as("n_sat"))
  }

  /** Per-label mean embedding, one output row per (label, dimension).
    * Components are fixed-pointed to e4 units BEFORE the sum so the
    * aggregate is exact integer math (map-side combinable, order- and
    * partitioning-invariant — a double sum's value depends on add
    * order); `mean` is the recovered double for library users, `sum_e4`
    * + `n` the integer-exact pair an oracle compares. */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(labelCol), (col("pos") + 1).as("dim"))
      .agg(
        sum(round(col("x").cast("double") * 10000).cast("long")).as("sum_e4"),
        count(lit(1)).as("n"))
      .select(col(labelCol), col("dim"), col("sum_e4"), col("n"),
        (col("sum_e4") / (col("n") * lit(10000.0))).as("mean"))
}
