package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash of a word array as one native codegen Expression.
  *
  * Semantically identical to the DataFrame formula it replaces:
  * explode(array_distinct(words)) → md5IdxK(word, hexChars) →
  * groupBy(doc) with `bits` conditional bit-sums → bit b set iff
  * votes_b * 2 > n_distinct_words. The column form shuffles one row per
  * (doc, word) and hash-aggregates `bits`+1 buffers; this expression
  * computes the signature in a single pass over the row's words —
  * no explode, no shuffle, stays in whole-stage codegen.
  */
case class SimHash(child: Expression, bits: Int, hexChars: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 62 && hexChars >= 1 && hexChars <= 15
    && 4 * hexChars >= bits, "signature must fit a positive long")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(words: Any): Any =
    SimHash.eval(words.asInstanceOf[ArrayData], bits, hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash$$.MODULE$$.eval($c, $bits, $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  def eval(words: ArrayData, bits: Int, hexChars: Int): Long = {
    val n = words.numElements()
    // distinct words, first-seen order (matches array_distinct)
    val seen = new java.util.HashSet[Any]()
    val votes = new Array[Int](bits)
    var distinct = 0
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (seen.add(w)) {
        distinct += 1
        val len = w.numBytes()
        val buf = Md5.buffer(len)
        w.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
        val h = Md5.hexPrefixLong(buf, len, hexChars)
        var b = 0
        while (b < bits) {
          votes(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) * 2 > distinct) sim |= 1L << b
      b += 1
    }
    sim
  }
}
