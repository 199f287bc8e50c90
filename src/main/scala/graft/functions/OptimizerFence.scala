package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that reports `deterministic = false`.
  *
  * The value IS deterministic — the flag is an optimizer fence, the
  * Scala-side twin of the guide's `udf(...).asNondeterministic()`
  * remedy for duplicated evaluation: the optimizer may not push a
  * filter below the projection computing a non-deterministic column,
  * may not clone the expression into a join condition, and may not
  * collapse the projection into an adjacent one. Used where a
  * per-row-EXPENSIVE expression (e.g. the O(len²) Levenshtein verify)
  * must be computed exactly once, in the stage the query author pinned
  * (after an explicit width-controlling repartition), instead of
  * riding a filter pushdown into whatever narrow AQE-coalesced join
  * stage the byte-based planner picked.
  *
  * Zero runtime cost: eval and codegen delegate to the child
  * unchanged.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "optimizer_fence"

  // the fence itself: block reorder/duplicate/constant-fold
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
