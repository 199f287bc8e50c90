package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two double arrays as a native codegen Expression.
  *
  * Accumulates LEFT-TO-RIGHT from 0.0 — bit-identical to the explicit
  * `a[1]*b[1] + a[2]*b[2] + ...` chain the DuckDB oracle evaluates
  * (IEEE: 0.0 + x == x up to zero-sign, which cannot alter a comparison
  * or any later nonzero sum), so cosines still hash-match exactly.
  *
  * Replaces 64-term unrolled Column trees: those were correct and fast
  * once compiled, but whole-stage codegen paid seconds of Janino
  * compilation per query for the giant methods. A static-call loop
  * generates constant-size code and evaluates as a tight JVM loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProduct$$.MODULE$$.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
