package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Strided word windows of a word array: element `i` is
  * `words[i*stride .. i*stride+window-1]` joined with a single space.
  * Two tail conventions cover every windowing query in the repo:
  *
  *  - `coverAll = true` ("lines" / "chunks"): windows start while ANY
  *    word remains — `m = max(n-1,0)/stride + 1` — so every word lands
  *    in at least one window and short tail windows are included.
  *    `stride == window` is the non-overlapping line split (x_line_dedup);
  *    `window > stride` is the overlapping pretraining chunker (x_chunk).
  *  - `coverAll = false` ("shingles"): windows start only while a FULL
  *    window fits — `m = max(n-window,0)/stride + 1` — except a doc
  *    shorter than one window, which still yields its single short
  *    window (at least one window per input, matching the k-shingle
  *    convention shared with [[ShingleHashes]]).
  *
  * Semantically identical to the Column formula
  * `transform(sequence(...), i -> concat_ws(' ', slice(w, i*stride+1,
  * window)))` — but that formula's lambda evaluates INTERPRETED per
  * element, and any expression Catalyst inlined into the lambda body
  * (the `split` that produced `w`, after projection collapse)
  * re-executes for EVERY window: O(n_windows × n_words) per document.
  * This expression is one tight JVM loop per row — O(n_windows ×
  * window) — and participates in whole-stage codegen via a static call.
  *
  * Null elements are skipped exactly like `concat_ws` (no separator
  * emitted for them), keeping the documented formula equivalence on
  * containsNull=true inputs.
  */
case class WordWindows(child: Expression, window: Int, stride: Int, coverAll: Boolean)
    extends UnaryExpression {
  require(window >= 1 && stride >= 1, "window and stride must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_windows"

  override protected def nullSafeEval(words: Any): Any =
    WordWindows.eval(words.asInstanceOf[ArrayData], window, stride, coverAll)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordWindows$$.MODULE$$.eval($c, $window, $stride, $coverAll)")

  override protected def withNewChildInternal(newChild: Expression): WordWindows =
    copy(child = newChild)
}

object WordWindows {
  private val Space = UTF8String.fromString(" ")

  def eval(words: ArrayData, window: Int, stride: Int, coverAll: Boolean): ArrayData = {
    val n = words.numElements()
    val base = if (coverAll) 1 else window
    val m = math.max(n - base, 0) / stride + 1
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val start = i * stride
      val end = math.min(start + window, n)
      val parts = new Array[UTF8String](math.max(end - start, 0))
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
