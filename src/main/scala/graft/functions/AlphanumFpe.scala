package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Alphanumeric scramble, injective per (length, alphabet) class — the
  * Spark-native analog of the reference's `alphanumeric unique=true`
  * mode (slice_db/transforms/text.py:45-60): format-preserving
  * encryption over the alphabet of character categories the input
  * actually uses, so distinct inputs OF THE SAME length and category
  * profile map to distinct outputs. That is the reference's own
  * contract (pyffx with a per-value alphabet + the same ord() fold-in),
  * and it is what key-column scrubbing relies on when the key column is
  * homogeneous (all-digits ids, fixed-format codes). It is NOT a global
  * injection: a mixed-class input (lower+digits) can encrypt into the
  * ciphertext space of a lowercase-only input's class — derive the
  * alphabet from the full 62-char set if cross-class uniqueness is
  * required. The reference reaches for pyffx; this is an original
  * Feistel construction with the same contract, chosen so the whole
  * cipher is reproducible in DuckDB SQL (see
  * [[Transforms.sqlAlphanumUnique]]).
  *
  * Construction, mirrored bit-for-bit by the oracle SQL:
  *  1. alphabet = UPPER? + lower? + digits? by categories present
  *     (all three when the input has none — text.py:48-54);
  *  2. chars outside the alphabet fold in by code point
  *     (`alphabet[ord(c) % n]`, text.py:57-59) — injectivity holds for
  *     inputs already inside their alphabet (same caveat as the
  *     reference);
  *  3. a 4-round Feistel over the two halves: each round replaces the
  *     left half by `alphabet[(idx(L_i) + k_i) % n]` per position,
  *     where the keystream `k_i = idx6(md5(md5(pepper|fpe|round|R) ||
  *     i))` is keyed on the OTHER half, then swaps. Digit-wise modular
  *     addition keyed on R is invertible given R, so every round — and
  *     the whole cipher — is a bijection on strings of one (length,
  *     alphabet) class (AlphanumFpeSpec holds injectivity by
  *     property).
  *
  * Category detection is ASCII (the reference uses unicode categories);
  * non-ASCII input folds into the alphabet via step 2 by CODE POINT,
  * matching the oracle's ord()/length() semantics on any input.
  */
case class AlphanumFpe(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "alphanum_fpe"

  override protected def nullSafeEval(value: Any, pepper: Any): Any =
    AlphanumFpe.encrypt(
      value.asInstanceOf[UTF8String], pepper.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p) =>
      s"graft.functions.AlphanumFpe$$.MODULE$$.encrypt($v, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AlphanumFpe =
    copy(left = newLeft, right = newRight)
}

object AlphanumFpe {
  val Rounds = 4
  private val Upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Digits = "0123456789"

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

  private def idx6(hex: String): Long =
    java.lang.Long.parseLong(hex.substring(0, 6), 16)

  /** The category alphabet of `v` (text.py:48-54). */
  def alphabetOf(v: String): String = {
    var hasU = false; var hasL = false; var hasD = false
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c >= 'A' && c <= 'Z') hasU = true
      else if (c >= 'a' && c <= 'z') hasL = true
      else if (c >= '0' && c <= '9') hasD = true
      i += 1
    }
    val sb = new java.lang.StringBuilder(62)
    if (hasU) sb.append(Upper)
    if (hasL) sb.append(Lower)
    if (hasD) sb.append(Digits)
    if (sb.length == 0) Upper + Lower + Digits else sb.toString
  }

  def encrypt(value: UTF8String, pepper: UTF8String): UTF8String = {
    val v = value.toString
    if (v.isEmpty) return value
    val p = pepper.toString
    val alphabet = alphabetOf(v)
    val n = alphabet.length
    // fold non-alphabet chars in by CODE POINT (text.py:57-59) —
    // iterating UTF-16 units would count a supplementary char as two
    // positions and fold surrogate halves, diverging from the oracle's
    // per-character ord()/length() (same fix as BpeVocab's symbols).
    // Every kept char is in the ASCII alphabet, so the mapped string is
    // one Char per position.
    val cps = v.codePoints().toArray
    val m = new Array[Char](cps.length)
    var i = 0
    while (i < cps.length) {
      val cp = cps(i)
      m(i) = if (cp < 128 && alphabet.indexOf(cp) >= 0) cp.toChar
        else alphabet.charAt(cp % n)
      i += 1
    }
    val half = m.length / 2
    var l = java.util.Arrays.copyOfRange(m, 0, half)
    var r = java.util.Arrays.copyOfRange(m, half, m.length)
    var round = 0
    while (round < Rounds) {
      val ks = md5Hex(p + "|fpe|" + round + "|" + new String(r))
      val next = new Array[Char](l.length)
      var j = 0
      while (j < l.length) {
        val d = idx6(md5Hex(ks + (j + 1)))
        next(j) = alphabet.charAt(((alphabet.indexOf(l(j).toInt) + d) % n).toInt)
        j += 1
      }
      // Feistel swap: (L, R) -> (R, L + F(R))
      l = r
      r = next
      round += 1
    }
    UTF8String.fromString(new String(l) + new String(r))
  }

  /** Inverse cipher — the audit path. Each encryption round is
    * (L, R) → (R, L ⊞ F_r(R)) with ⊞ digit-wise modular addition, so
    * decryption peels rounds in reverse: R_r = L_{r+1},
    * L_r = R_{r+1} ⊟ F_r(R_r). The ALPHABET must be supplied: it was
    * derived from the plaintext's category profile, which the
    * ciphertext does not necessarily exhibit (the same contract as the
    * reference's pyffx.String, which is constructed with an explicit
    * alphabet). Returns the FOLDED plaintext — identical to the
    * original whenever the original was inside its alphabet (the
    * collision-free contract's domain). */
  def decrypt(cipher: String, pepper: String, alphabet: String): String = {
    if (cipher.isEmpty) return cipher
    require(alphabet.nonEmpty, "decrypt: empty alphabet")
    // an out-of-alphabet cipher char means the WRONG alphabet was
    // supplied — indexOf's -1 would otherwise decode to plausible
    // garbage, exactly where an audit needs a loud failure
    cipher.foreach(c => require(alphabet.indexOf(c.toInt) >= 0,
      s"decrypt: cipher char '$c' not in the supplied alphabet"))
    val n = alphabet.length
    val m = cipher.toCharArray
    // final sizes equal the initial (floor, ceil) split for even Rounds
    val half = m.length / 2
    var l = java.util.Arrays.copyOfRange(m, 0, half)
    var r = java.util.Arrays.copyOfRange(m, half, m.length)
    var round = Rounds - 1
    while (round >= 0) {
      val prevR = l
      val ks = md5Hex(pepper + "|fpe|" + round + "|" + new String(prevR))
      val prevL = new Array[Char](r.length)
      var j = 0
      while (j < r.length) {
        val d = idx6(md5Hex(ks + (j + 1)))
        val idx = ((alphabet.indexOf(r(j).toInt) - (d % n) + n) % n).toInt
        prevL(j) = alphabet.charAt(idx)
        j += 1
      }
      l = prevL
      r = prevR
      round -= 1
    }
    new String(l) + new String(r)
  }
}
