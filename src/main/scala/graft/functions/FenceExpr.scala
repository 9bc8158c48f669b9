package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

/** Identity pass-through whose ONLY job is to pin its subtree where the
  * plan author placed it — a typed placement contract.
  *
  * Catalyst has exactly one lever that stops predicate pushdown,
  * projection collapse, and constraint inference from relocating or
  * duplicating an expression: `deterministic = false`. Historically the
  * engine set that flag on [[DictDecode]] itself, which worked but
  * encoded the placement contract as a false claim about the lookup's
  * semantics (the broadcast-map decode is perfectly deterministic) and
  * tied correctness to how future Spark versions treat nondeterminism
  * on arbitrary expressions. `Fence` separates the two concerns: the
  * wrapped child states its honest semantics, and the wrapper states —
  * by name, in the plan — "evaluate this exactly here, once per row of
  * THIS operator's output".
  *
  * Why the engine needs it: decode sits at plan TOPS (envelope/gate
  * presentation over aggregated, page-bounded rows). Without a fence,
  * Catalyst pushes the `inner` null-filter `isnotnull(decode(key))`
  * below the aggregate and into join keys — running the map lookup once
  * per CORPUS row instead of once per result row (measured 0.27 →
  * 0.40 s on a 4-row facet; at 100 TB it would be a full-corpus
  * decode). Pinned in PlanContractSpec: the optimized plan keeps decode
  * above the aggregate.
  *
  * Codegen is a zero-cost alias of the child's generated code, so the
  * fence never leaves whole-stage codegen or adds a virtual call.
  */
case class Fence(child: Expression) extends UnaryExpression {

  override def dataType = child.dataType
  override def nullable: Boolean = child.nullable

  /** The barrier itself. NOT a claim that the child is nondeterministic
    * — see the class doc. */
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
