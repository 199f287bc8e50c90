package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Non-overlapping `seg`-word "lines" of a word array: element `i` is
  * `words[i*seg .. i*seg+seg-1]` joined with a single space (short
  * final line included; at least one line per input, so an empty/1-word
  * doc still yields one line).
  *
  * Semantically identical to the Column formula
  * `transform(sequence(0, (size(w)-1) div seg), i -> concat_ws(' ',
  * slice(w, i*seg+1, seg)))` — but that formula's lambda evaluates
  * INTERPRETED per element, and any expression inlined into the lambda
  * body (the `split` that produced `w`, after Catalyst collapses the
  * projection) re-executes for EVERY line: O(n_lines × n_words) per
  * document. This expression is one tight JVM loop per row — O(n_words)
  * total — and participates in whole-stage codegen via a static call.
  *
  * Null elements are skipped exactly like `concat_ws` (no separator
  * emitted for them), keeping the documented formula equivalence on
  * containsNull=true inputs.
  */
case class LineSplit(child: Expression, seg: Int) extends UnaryExpression {
  require(seg >= 1, "seg must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "line_split"

  override protected def nullSafeEval(words: Any): Any =
    LineSplit.eval(words.asInstanceOf[ArrayData], seg)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LineSplit$$.MODULE$$.eval($c, $seg)")

  override protected def withNewChildInternal(newChild: Expression): LineSplit =
    copy(child = newChild)
}

object LineSplit {
  private val Space = UTF8String.fromString(" ")

  def eval(words: ArrayData, seg: Int): ArrayData = {
    val n = words.numElements()
    val m = math.max(n - 1, 0) / seg + 1
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val start = i * seg
      val end = math.min(start + seg, n)
      val parts = new Array[UTF8String](end - start)
      var j = start
      while (j < end) {
        // concatWs skips null inputs, matching concat_ws semantics
        parts(j - start) = if (words.isNullAt(j)) null else words.getUTF8String(j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
