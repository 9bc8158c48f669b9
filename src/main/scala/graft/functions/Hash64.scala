package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Seed-0 XXH64 term hashing.
  *
  * The reference dictionary-encodes every RDF term with
  * `xxhash.xxh64_hexdigest(term)` — XXH64 over the UTF-8 bytes of the
  * full N3 token, seed 0 (reference: src/bikidata/main.py:118-119,
  * src/bikidata/query.py:42,69,130). Spark's built-in `xxhash64()` SQL
  * function uses seed 42, so we instantiate the same Catalyst
  * [[XxHash64]] expression with seed 0 — bit-for-bit parity with the
  * reference (and with any DuckDB oracle loaded from the same hashes).
  *
  * The unsigned 64-bit value is stored in a signed LongType with the
  * same bit pattern; [[Hash64.toUnsignedString]] renders the canonical
  * unsigned decimal at the edges.
  */
object Hash64 {
  /** Column form: codegen'd Catalyst expression, usable in any plan. */
  def apply(c: Column): Column =
    GraftShims.column(XxHash64(Seq(GraftShims.expression(c)), 0L))

  /** Driver-side scalar form (same code path as the expression's eval). */
  def hashString(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      UTF8String.fromString(s), StringType, 0L)

  def toUnsignedString(h: Long): String = java.lang.Long.toUnsignedString(h)
}
