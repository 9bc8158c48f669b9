package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared string-input typing + the shingle tokenization the dedup
  * sketches agree on: lowercase, whitespace-split, empty tokens
  * dropped, n-word shingles joined by single spaces, DISTINCT (set
  * semantics — the sketches are over the shingle set, not multiset).
  * A document shorter than n words contributes its whole token run as
  * one shingle (so short docs still sketch), and an empty document
  * contributes the empty-string shingle — both rules identical to the
  * Scala UDFs these expressions replace, so every signature, band
  * bucket, and Jaccard value is bit-for-bit unchanged (pinned in
  * OpsSpec). The ONE deliberate divergence: a NULL document sketches
  * to NULL (dropped by the downstream posexplode/join) instead of the
  * UDF's zero signature — zero signatures made every null-text doc
  * band-collide with every other, an O(null²) pair explosion. */
private[functions] trait SketchTyping { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires STRING input, got ${other.simpleString}")
  }
}

private[functions] object SketchExpressions {

  /** Distinct n-word shingles as UTF8String byte carriers, hoisted ONCE
    * per document (the UDFs re-built a UTF8String per hash call — k×
    * redundant conversions in the MinHash loop). */
  def distinctShingles(text: UTF8String, n: Int): Array[UTF8String] = {
    val toks = text.toString.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val sh: Array[String] =
      if (toks.length < n) Array(toks.mkString(" "))
      else toks.sliding(n).map(_.mkString(" ")).toArray
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < sh.length) { seen.add(sh(i)); i += 1 }
    val out = new Array[UTF8String](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    out
  }
}

/** MinHash signature — codegen replacement for `Dedup.minhashUdf`:
  * k minima over seeded XXH64 of the document's distinct n-word
  * shingle set, one pass per document, no shuffle. Loop order is
  * shingle-outer (k minima updated per shingle) with the UTF-8 bytes
  * hoisted per shingle; values are identical to the seed-inner UDF
  * loop — min is order-independent and the per-(shingle, seed) hashes
  * are the same `XxHash64Function.hash` calls. */
case class MinHashSig(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression with SketchTyping {

  require(k >= 1 && shingleN >= 1, s"minhash params must be >= 1, got k=$k n=$shingleN")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(s: Any): Any =
    MinHashSig.compute(s.asInstanceOf[UTF8String], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.MinHashSig.compute($t, $k, $shingleN);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  def apply(s: Column, k: Int, shingleN: Int): Column =
    GraftShims.column(MinHashSig(GraftShims.expression(s), k, shingleN))

  /** Hot loop shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int, n: Int): ArrayData = {
    val sh = SketchExpressions.distinctShingles(text, n)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var s = 0
    while (s < sh.length) {
      val bytes = sh(s)
      var i = 0
      while (i < k) {
        val h = XxHash64Function.hash(bytes, StringType, i.toLong)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }
}

/** Sorted hashed shingle set — codegen replacement for the shingle UDF
  * feeding `Dedup.minhashDedup`'s exact-Jaccard verification (sorted so
  * the pair-side intersection is a linear merge). Seed-0 XXH64 per
  * shingle, same values as `Hash64.hashString`. */
case class ShingleHashes(child: Expression, shingleN: Int)
    extends UnaryExpression with SketchTyping {

  require(shingleN >= 1, s"shingle n must be >= 1, got $shingleN")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(s: Any): Any =
    ShingleHashes.compute(s.asInstanceOf[UTF8String], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.ShingleHashes.compute($t, $shingleN);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  def apply(s: Column, shingleN: Int): Column =
    GraftShims.column(ShingleHashes(GraftShims.expression(s), shingleN))

  def compute(text: UTF8String, n: Int): ArrayData = {
    val sh = SketchExpressions.distinctShingles(text, n)
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) {
      out(i) = XxHash64Function.hash(sh(i), StringType, 0L)
      i += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}

/** 64-bit SimHash of the token multiset — codegen replacement for
  * `Dedup.simhashUdf`: per-token seed-0 XXH64 bit votes, majority per
  * bit. Tokenization matches the UDF (lowercase, whitespace-split,
  * empties dropped; multiset — repeated tokens vote repeatedly). */
case class SimHash64(child: Expression)
    extends UnaryExpression with SketchTyping {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(s: Any): Any =
    SimHash64.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.SimHash64.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  def apply(s: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(s)))

  def compute(text: UTF8String): Long = {
    val toks = text.toString.toLowerCase.split("\\s+")
    val acc = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        val h = XxHash64Function.hash(UTF8String.fromString(toks(t)), StringType, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}
