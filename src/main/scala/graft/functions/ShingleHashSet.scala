package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sorted distinct word-`k`-shingle hashes of a word array, as one
  * native codegen Expression.
  *
  * Semantically identical to the Column formula
  * `sort_array(array_distinct(transform(shingles, x => md5IdxK(x, hex))))`
  * (shingle = `words[i..i+k-1].mkString(" ")`, short tail shingles
  * included, at least one shingle per doc; hash = first `hexChars` hex
  * chars of md5(utf8) = first hexChars/2 digest bytes big-endian).
  * The difference is mechanical: higher-order-function lambdas evaluate
  * INTERPRETED per element — md5 on 1.5M shingles at sf0.1 walks the
  * interpreter 1.5M times and allocates every intermediate shingle
  * string and array. This expression runs one tight JVM loop per row,
  * digesting word bytes directly (no shingle String materializes), and
  * participates in whole-stage codegen via a static call.
  */
case class ShingleHashSet(child: Expression, k: Int, hexChars: Int)
    extends UnaryExpression {
  require(k >= 1 && hexChars >= 2 && hexChars % 2 == 0 && hexChars <= 14,
    "hexChars must be even and fit a positive long")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override protected def nullSafeEval(words: Any): Any =
    ShingleHashSet.eval(words.asInstanceOf[ArrayData], k, hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashSet$$.MODULE$$.eval($c, $k, $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

object ShingleHashSet {
  def eval(words: ArrayData, k: Int, hexChars: Int): ArrayData = {
    val out = WindowHash.hashWindows(words, k, hexChars)
    val m = out.length
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted hashes
    var w = 0
    var i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == m) out else java.util.Arrays.copyOf(out, w))
  }
}
