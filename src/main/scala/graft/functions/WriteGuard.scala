package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Pushdown barrier for write-side invariant guards (r14 — ADVICE r13
  * medium): a CHECK/region guard fused into a write's scan as an
  * ordinary deterministic `Filter` can be RELOCATED by Catalyst's
  * predicate pushdown below the joins/filters inside the input plan
  * (it references only constraint columns), evaluating `raise_error`
  * on rows the plan would never write — a spurious constraint abort
  * of a valid INSERT whose source join/filter excludes the violating
  * rows.
  *
  * The fix is the classic one the reference's dedicated write-side
  * invariant-check operator gets structurally: the guard predicate is
  * wrapped in this expression, which evaluates its child VERBATIM
  * (same value, same codegen — the guard stays inside
  * WholeStageCodegen) but declares itself NON-DETERMINISTIC, which
  * every pushdown rule (`PushDownPredicates`,
  * `PushPredicateThroughJoin`, ...) refuses to move. The filter
  * therefore stays exactly where the write path planted it: above the
  * caller's fully-filtered plan, seeing only the rows that will
  * actually land. */
case class WriteGuardBarrier(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  /** The lie that does the work: evaluation IS deterministic, but
    * declaring otherwise pins the enclosing Filter in place. Spark's
    * own `AssertTrue`-based constraint checks in DeltaInvariant-style
    * writers use a dedicated non-pushable operator for the same
    * reason; an expression-level flag is the extension-point
    * equivalent. */
  override lazy val deterministic: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
  : Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression)
  : WriteGuardBarrier = copy(child = newChild)
}
