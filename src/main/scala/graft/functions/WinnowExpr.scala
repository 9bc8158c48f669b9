package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for md5 winnowing fingerprints
  * (Schleimer/Wilkerson/Aiken, SIGMOD'03) over an ALREADY-NORMALIZED
  * string: hash every k-character gram with the low 60 bits of its md5,
  * keep the minimum of each sliding w-window, first-occurrence
  * deduplicate. Inputs shorter than k (or with fewer than w grams)
  * yield an empty array; null stays null.
  *
  * Replaces the declarative `transform(sequence(...), i -> conv(substr(
  * md5(substr(s,i,k)),1,15),16,10))` + per-window `array_min(slice(...))`
  * chain — semantically identical (parity pinned in OpsSpec), but that
  * form runs as interpreted higher-order functions outside whole-stage
  * codegen and re-slices the hash array per window: ~5× slower than this
  * single pass. The md5 selection rule is kept EXACTLY so the DuckDB
  * oracle reproduces every fingerprint bit-for-bit (60 bits keep the
  * value positive: signed min == unsigned min on both engines).
  *
  * Reference analog: the near-dup sketches bikidata leans on DuckDB +
  * exact SQL for; same WordGrams-style static-call codegen body.
  */
case class WinnowMd5(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"winnow params must be >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_md5 requires STRING input, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    WinnowMd5.compute(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.WinnowMd5.compute($t, $k, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMd5 {

  import org.apache.spark.sql.{Column, GraftShims}

  def apply(s: Column, k: Int, w: Int): Column =
    GraftShims.column(WinnowMd5(GraftShims.expression(s), k, w))

  private val Empty = new GenericArrayData(Array.empty[Long])

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Low 60 bits of md5(bytes) — the value `conv(substr(md5(x),1,15),
    * 16, 10)` (and DuckDB's `('0x' || substr(md5(x),1,15))::BIGINT`)
    * computes: the first 15 hex chars are the first 7 digest bytes plus
    * the high nibble of the 8th. */
  private def md5Low60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xffL) >>> 4)
  }

  /** Hot loop shared by interpreted eval and generated code. Substrings
    * count CHARACTERS (UTF8String.substringSQL), matching Spark's and
    * DuckDB's `substr` on multi-byte text. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val chars = s.numChars()
    if (chars < k) return Empty
    val nGrams = chars - k + 1
    if (nGrams < w) return Empty
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = md5Low60(s.substringSQL(i + 1, k).getBytes)
      i += 1
    }
    val nWins = nGrams - w + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](nWins * 2)
    var j = 0
    while (j < nWins) {
      var m = hashes(j)
      var x = j + 1
      while (x < j + w) { if (hashes(x) < m) m = hashes(x); x += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
