package graft.functions

import graft.fts.FtsSettings
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term-frequency analysis for the FTS postings build:
  * `struct(len INT, terms ARRAY<STRUCT<term STRING, tf BIGINT>>)` where
  * `len` is the analyzed token count (multiset) and `terms` carries one
  * entry per DISTINCT token with its in-document frequency.
  *
  * This is the shuffle eliminator of the index build: tf is a
  * per-document statistic, so counting it row-locally and exploding the
  * compressed (term, tf) entries replaces the former
  * explode-every-token → shuffle → `groupBy(hash, term)` plan — the
  * shuffle that moved the entire tokenized corpus (every token
  * occurrence) now moves nothing, and the only remaining exchange in
  * the build is the term-clustering repartition over the already
  * tf-compressed postings. Analysis is [[FtsSettings.indexTokens]]
  * exactly (the same call), so postings rows are bit-identical to the
  * grouped plan's (pinned in FtsSpec). NULL text analyzes to
  * `(0, [])` — a zero-length doc, keeping numDocs/avgdl semantics.
  *
  * Entry order is first-occurrence within the document — deterministic,
  * and irrelevant downstream (postings are re-clustered by term). */
case class FtsTokenCountsExpr(child: Expression, settings: FtsSettings)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }

  override def dataType: DataType = FtsTokenCountsExpr.schema
  override def nullable: Boolean = false
  override def prettyName: String = "fts_token_counts"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    FtsTokenCountsExpr.compute(
      if (v == null) null else v.asInstanceOf[UTF8String], settings)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ftsSettings", settings,
      classOf[FtsSettings].getName)
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${childGen.code}
        $javaType ${ev.value} = graft.functions.FtsTokenCountsExpr.compute(
          ${childGen.isNull} ? null : ${childGen.value}, $ref);
      """,
      isNull = FalseLiteral)
  }

  override def toString: String = s"fts_token_counts($child)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FtsTokenCountsExpr {

  val schema: StructType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("terms", ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  /** Hot loop shared by interpreted eval and generated code; null-safe
    * (null text → zero-length doc, see class doc). */
  def compute(text: UTF8String, settings: FtsSettings): InternalRow = {
    if (text == null)
      return new GenericInternalRow(Array[Any](0, new GenericArrayData(Array.empty[Any])))
    val toks = settings.indexTokens(text.toString)
    val counts = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    val entries = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      entries(o) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      o += 1
    }
    new GenericInternalRow(Array[Any](toks.length, new GenericArrayData(entries)))
  }

  def apply(text: Column, settings: FtsSettings): Column =
    GraftShims.column(FtsTokenCountsExpr(GraftShims.expression(text), settings))
}
