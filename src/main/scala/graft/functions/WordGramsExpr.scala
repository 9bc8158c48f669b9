package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the word-n-gram window over a token
  * array: every `n`-token window space-joined, optionally first-occurrence
  * deduplicated; fewer than `n` tokens yields an empty array.
  *
  * Replaces the declarative
  * `transform(sequence(...), i -> array_join(slice(tokens,i,n), " "))`
  * + `array_distinct` chain, which is semantically identical but runs as
  * interpreted higher-order functions OUTSIDE whole-stage codegen — per
  * gram it allocates a slice array, an index box, and a join buffer, and
  * `array_distinct` re-hashes the output. The n-gram explode is the
  * heaviest row-local stage of every gram-based pipeline op (decontam,
  * dup-span stats, top-n-grams, n-gram Jaccard), so it gets the same
  * treatment as cosine ([[CosineDistance]]): one primitive loop over the
  * unsafe `ArrayData` operating on `UTF8String` directly (no
  * String conversion), with a static-call codegen body that stays inside
  * the surrounding whole-stage pipeline.
  *
  * Parity contract (pinned in OpsSpec): output order and content are
  * BYTE-IDENTICAL to the declarative chain — window order, `concat_ws`
  * null-skipping, first-occurrence dedup.
  */
case class WordGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_grams requires ARRAY<STRING> input, got ${other.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any =
    WordGrams.compute(tokens.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.WordGrams.compute($t, $n, $distinct);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGrams {

  import org.apache.spark.sql.{Column, GraftShims}

  def apply(tokens: Column, n: Int, distinct: Boolean): Column =
    GraftShims.column(WordGrams(GraftShims.expression(tokens), n, distinct))

  private val Space = UTF8String.fromString(" ")

  /** Hot loop shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      // null elements are skipped by concat_ws in the declarative chain;
      // UTF8String.concatWs skips nulls identically
      toks(i) = tokens.getUTF8String(i)
      i += 1
    }
    val nGrams = len - n + 1
    val out = new java.util.ArrayList[AnyRef](nGrams)
    val seen = if (distinct) new java.util.HashSet[UTF8String](nGrams * 2) else null
    val window = new Array[UTF8String](n)
    i = 0
    while (i < nGrams) {
      System.arraycopy(toks, i, window, 0, n)
      val gram = UTF8String.concatWs(Space, window: _*)
      if (seen == null || seen.add(gram)) out.add(gram)
      i += 1
    }
    new GenericArrayData(out.toArray())
  }
}
