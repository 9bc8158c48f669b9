package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst form of the dictionary-decode broadcast lookup
  * (hash → term string, null when undecodable).
  *
  * Replaces the Scala UDF the engine previously wrapped around the
  * broadcast map: the lookup itself is identical, but a UDF pays
  * `ResolveEncodersInUDF` + `HandleNullInputsForUDF` analyzer work on
  * EVERY query plan that decodes (which is every gate query — measured
  * several ms of pure planning per query on the serving path), while a
  * native expression resolves for free and stays inside whole-stage
  * codegen.
  *
  * Honestly deterministic: same hash, same string, always. The "decode
  * runs once per RESULT row, never per corpus row" placement contract
  * that the old UDF established via a nondeterminism claim now lives in
  * the dedicated [[Fence]] wrapper — [[graft.algebra.EngineContext
  * .decodeExpr]] is the single construction point and always wraps
  * `Fence(DictDecode(...))`.
  */
case class DictDecode(child: Expression,
    bc: Broadcast[Map[Long, String]])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else DictDecode.lookup(bc, v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("dictBc", bc,
      classOf[Broadcast[_]].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      UTF8String ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.functions.DictDecode.lookup($bcRef, ${childGen.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DictDecode {
  /** Shared eval/codegen body: one broadcast-map probe per RESULT row.
    * The String → UTF8String conversion per hit matches what the UDF
    * wrapper did implicitly. */
  def lookup(bc: Broadcast[_], h: Long): UTF8String =
    bc.value.asInstanceOf[Map[Long, String]].get(h) match {
      case Some(s) => UTF8String.fromString(s)
      case None => null
    }
}
