package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Positional word-`k`-shingle hashes of a word array: element `i` is
  * the hash of window `words[i..i+k-1]` — every window, in order, no
  * dedup (the positional sibling of [[ShingleHashSet]]).
  *
  * Semantically identical to the Column formula
  * `transform(shingles, x => md5IdxK(x, hexChars))` (shingle =
  * `words[i..i+k-1].mkString(" ")`, short tail windows included, at
  * least one window per doc; hash = first `hexChars` hex chars of
  * md5(utf8) = first hexChars/2 digest bytes big-endian), so
  * `posexplode` over it yields exactly the (pos, hashed-window) rows
  * the span queries join on and the DuckDB oracles re-derive.
  *
  * The difference is mechanical, same story as ShingleHashSet:
  * higher-order-function lambdas evaluate INTERPRETED per element, and
  * the window strings (~100 chars each, corpus-sized × stride 1)
  * materialize only to be hashed and dropped. One tight JVM loop per
  * row, word bytes digested directly, whole-stage codegen via a static
  * call.
  */
case class ShingleHashes(child: Expression, k: Int, hexChars: Int)
    extends UnaryExpression {
  require(k >= 1 && hexChars >= 2 && hexChars % 2 == 0 && hexChars <= 14,
    "hexChars must be even and fit a positive long")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(words: Any): Any =
    ShingleHashes.eval(words.asInstanceOf[ArrayData], k, hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes$$.MODULE$$.eval($c, $k, $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def eval(words: ArrayData, k: Int, hexChars: Int): ArrayData =
    new GenericArrayData(WindowHash.hashWindows(words, k, hexChars))
}
