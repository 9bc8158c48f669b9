package graft

import graft.functions.Hash64
import org.apache.spark.sql.functions._

/** Seed-0 XXH64 parity: the reference hashes every N3 term with
  * `xxhash.xxh64_hexdigest` (seed 0). These vectors are the published
  * XXH64 test values; if they hold, Spark-side hashing bit-matches the
  * reference dictionary encoding. */
class HashSpec extends SparkSpec {

  // canonical XXH64(seed=0) vectors (xxHash reference implementation)
  val vectors: Seq[(String, String)] = Seq(
    "" -> "ef46db3751d8e999",
    "a" -> "d24ec4f1a98c6e5b",
    "abc" -> "44bc2cf5ad770999")

  test("driver-side hashString matches canonical XXH64 vectors") {
    for ((in, hex) <- vectors) {
      val expected = java.lang.Long.parseUnsignedLong(hex, 16)
      assert(Hash64.hashString(in) === expected, s"input '$in'")
    }
  }

  test("column expression agrees with driver-side hash") {
    import spark.implicits._
    val terms = Seq("<http://ex/s>", "\"Hello World\"@en", "_:b0", "")
    val df = terms.toDF("t").select(col("t"), Hash64(col("t")).as("h"))
    df.collect().foreach { row =>
      assert(row.getLong(1) === Hash64.hashString(row.getString(0)))
    }
  }

  test("unsigned rendering round-trips") {
    val h = Hash64.hashString("<http://ex/s>")
    assert(java.lang.Long.parseUnsignedLong(Hash64.toUnsignedString(h)) === h)
  }
}
