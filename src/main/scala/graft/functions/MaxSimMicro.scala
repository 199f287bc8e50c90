package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Late-interaction MaxSim in integer micro-units as ONE native codegen
  * Expression — the scorer of the s_maxsim / token-index family.
  *
  * Replaces the 8x8-token Column tree (64 tokDots = 1024 `element_at`
  * calls per pair, each with its own bounds/null check) with a tight
  * two-level loop over the raw ArrayData. The arithmetic is
  * BIT-IDENTICAL to the tree it replaces and to the DuckDB oracle's
  * `sqlMaxSim` string:
  *
  *   - each token dot accumulates LEFT-TO-RIGHT from 0.0 (IEEE:
  *     0.0 + x == x up to zero-sign, which cannot change a max
  *     selection or the floor);
  *   - the per-query-token max is a SELECTION over the 8 finite dots
  *     (strictly-greater replace == Spark's `greatest` on finite
  *     doubles; embeddings are finite by construction);
  *   - floor(best * 1e6) → long, summed over the 8 query tokens —
  *     order-independent integer adds.
  *
  * Inputs shorter than m*sub return null (the tree's `element_at`
  * out-of-range null propagates to null through greatest/sum the same
  * way); 64-dim corpus vectors never hit that path.
  */
case class MaxSimMicro(left: Expression, right: Expression,
    m: Int = 8, sub: Int = 8) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "maxsim_micro"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MaxSimMicro.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val score = s"graft.functions.MaxSimMicro$$.MODULE$$.score($$a, $$b, $m, $sub)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = score.replace("$a", a).replace("$b", b)
      s"""
         |Object r = $boxed;
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) r).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxSimMicro =
    copy(left = newLeft, right = newRight)
}

object MaxSimMicro {
  /** Null (boxed) when either array is shorter than m*sub — mirroring
    * the element_at-chain null propagation of the Column tree. */
  def score(a: ArrayData, b: ArrayData, m: Int, sub: Int): java.lang.Long = {
    val need = m * sub
    if (a.numElements() < need || b.numElements() < need) return null
    var total = 0L
    var t = 0
    while (t < m) {
      var best = Double.NegativeInfinity
      var first = true
      var u = 0
      while (u < m) {
        var acc = 0.0
        var i = 0
        while (i < sub) {
          acc += a.getDouble(t * sub + i) * b.getDouble(u * sub + i)
          i += 1
        }
        if (first || acc > best) { best = acc; first = false }
        u += 1
      }
      total += math.floor(best * 1000000.0).toLong
      t += 1
    }
    java.lang.Long.valueOf(total)
  }
}
