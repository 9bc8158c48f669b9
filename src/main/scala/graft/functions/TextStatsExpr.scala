package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen forms of the per-row text statistics every document
  * gate leans on (token count, stopword count, ASCII-class counts).
  *
  * The declarative originals are semantically simple but run hot at
  * corpus scale and partly OUTSIDE whole-stage codegen:
  * `size(split(trim(s), "\\s+"))` materializes a token array per row
  * just to take its length; `filter(tokens, t.isin(50 words))` is an
  * interpreted higher-order function doing ~50 string compares per
  * token; `length(regexp_replace(s, class, ""))` builds a stripped
  * copy of every row through the regex engine to count characters.
  * Each expression here is one byte-level pass, no intermediate
  * allocation — same static-call codegen body as [[WordGrams]] /
  * [[WinnowMd5]].
  *
  * Semantics are EXACT twins of the declarative forms (the DuckDB
  * oracles re-express those in SQL, so any drift is a red gate):
  * - Spark `trim` strips 0x20 only; Java-regex `\s` is the ASCII set
  *   {tab, LF, VT, FF, CR, space}; `split(s, p)` uses limit −1, which
  *   KEEPS trailing empty tokens — so `size(split(trim(s),"\\s+"))`
  *   equals (number of whitespace runs) + 1, including the empty-string
  *   edge (1) and the all-whitespace edge (2).
  * - Stopword matching lowercases via `UTF8String.toLowerCase` — the
  *   same call Spark's `lower` compiles to — and only non-whitespace
  *   runs can match (empty edge tokens are never stopwords).
  * - The punct/digit classes are the ASCII ranges of the original
  *   regex character classes; class bytes are single-byte UTF-8, so a
  *   byte scan counts exactly the characters the regex form counted.
  * Parity with the declarative twins is property-pinned in OpsSpec.
  */
object TextStats {

  private final val WS_MAX = 0x20
  @inline private def isWs(b: Byte): Boolean = {
    // \s = [ \t\n\x0B\f\r] = 0x09-0x0D plus 0x20
    val v = b & 0xFF
    v == 0x20 || (v >= 0x09 && v <= 0x0D)
  }

  /** size(split(trim(s), "\\s+")) without the array. */
  def wsTokenCount(s: UTF8String): Int = {
    val t = s.trim() // 0x20 both ends, same as Spark trim
    val bytes = t.getBytes
    var runs = 0
    var inWs = false
    var i = 0
    while (i < bytes.length) {
      val w = isWs(bytes(i))
      if (w && !inWs) runs += 1
      inWs = w
      i += 1
    }
    runs + 1
  }

  /** Bit table for an ASCII character class; chars >= 0x80 never match. */
  final class AsciiTable(ranges: Seq[(Char, Char)]) extends Serializable {
    val bits = new Array[Boolean](128)
    for ((lo, hi) <- ranges; c <- lo to hi) bits(c) = true
  }

  /** `[!-/:-@\[-`{-~]` — the punctCount class. */
  val Punct = new AsciiTable(Seq(('!', '/'), (':', '@'), ('[', '`'), ('{', '~')))
  /** `[0-9]` — the digitCount class. */
  val Digit = new AsciiTable(Seq(('0', '9')))

  def asciiCount(s: UTF8String, table: AsciiTable): Int = {
    val bytes = s.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xFF
      if (v < 128 && table.bits(v)) n += 1
      i += 1
    }
    n
  }

  /** size(filter(split(trim(lower(s)), "\\s+"), t => t.isin(words))). */
  def stopwordCount(s: UTF8String, set: java.util.HashSet[UTF8String]): Int = {
    val lower = s.toLowerCase // the exact call Spark's `lower` makes
    val bytes = lower.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        // fromBytes wraps without copying; equality is byte-wise
        if (set.contains(UTF8String.fromBytes(bytes, start, i - start))) n += 1
      } else i += 1
    }
    n
  }

  def toSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => set.add(UTF8String.fromString(w)))
    set
  }
}

sealed abstract class TextStatExpr extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
}

/** Whitespace token count — `size(split(trim(s), "\\s+"))`. */
case class WsTokenCount(child: Expression) extends TextStatExpr {
  override def nullSafeEval(s: Any): Any =
    TextStats.wsTokenCount(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextStats.wsTokenCount($t);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ASCII-class character count — `length(regexp_replace(s, "[^cls]", ""))`
  * for a class of single-byte characters. `punct` and `digit` name the
  * two tables the engine uses. */
case class AsciiClassCount(child: Expression, cls: String) extends TextStatExpr {
  require(cls == "punct" || cls == "digit", s"unknown ASCII class '$cls'")
  @transient private lazy val table =
    if (cls == "punct") TextStats.Punct else TextStats.Digit
  override def nullSafeEval(s: Any): Any =
    TextStats.asciiCount(s.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("asciiTable", table,
      classOf[TextStats.AsciiTable].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextStats.asciiCount($t, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Stopword hits over the whitespace tokens of the lowercased text —
  * `size(filter(split(trim(lower(s)), "\\s+"), t => t.isin(words)))`. */
case class StopwordCount(child: Expression, words: Seq[String]) extends TextStatExpr {
  @transient private lazy val set = TextStats.toSet(words)
  override def nullSafeEval(s: Any): Any =
    TextStats.stopwordCount(s.asInstanceOf[UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextStats.stopwordCount($t, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
