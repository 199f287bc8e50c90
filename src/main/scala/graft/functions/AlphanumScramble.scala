package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-character class-preserving scramble — the Spark-native analog of
  * the reference's alphanumeric transform (slice_db/transforms/text.py:17-73):
  * lowercase stays lowercase, uppercase stays uppercase, digits stay
  * digits, everything else passes through.
  *
  * Implemented as a native Catalyst Expression WITH codegen (not a UDF):
  * `doGenCode` emits a direct static call, so the expression stays inside
  * whole-stage codegen — no boxing, no serialized closures on the hot
  * path.
  *
  * Determinism contract (mirrored bit-for-bit by the DuckDB oracle SQL in
  * [[Transforms.sqlAlphanum]]):
  * {{{
  *   seed   = md5hex(value || pepper)
  *   out[i] = class_base + int(md5hex(seed || i)[0:6], 16) % class_size
  * }}}
  * with 1-based `i`. Scope is ASCII (multi-byte chars pass through
  * unchanged and count one position per UTF-16 unit — identical to the
  * oracle on ASCII inputs, which is all the test corpus contains).
  */
case class AlphanumScramble(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are guaranteed strings by the Transforms.alphanum builder
  // (which casts); AbstractDataType/ExpectsInputTypes are private[sql].
  override def dataType: DataType = StringType
  override def prettyName: String = "alphanum_scramble"

  override protected def nullSafeEval(value: Any, pepper: Any): Any =
    AlphanumScramble.scramble(
      value.asInstanceOf[UTF8String], pepper.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p) =>
      s"graft.functions.AlphanumScramble$$.MODULE$$.scramble($v, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AlphanumScramble =
    copy(left = newLeft, right = newRight)
}

object AlphanumScramble {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private def idx6(hex: String): Long = java.lang.Long.parseLong(hex.substring(0, 6), 16)

  def scramble(value: UTF8String, pepper: UTF8String): UTF8String = {
    val v = value.toString
    val seed = md5Hex(v + pepper.toString)
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      val out =
        if (c >= 'a' && c <= 'z') ('a' + idx6(md5Hex(seed + (i + 1))) % 26).toChar
        else if (c >= 'A' && c <= 'Z') ('A' + idx6(md5Hex(seed + (i + 1))) % 26).toChar
        else if (c >= '0' && c <= '9') ('0' + idx6(md5Hex(seed + (i + 1))) % 10).toChar
        else c
      sb.append(out)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
