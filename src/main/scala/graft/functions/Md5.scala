package graft.functions

/** Zero-allocation MD5 (RFC 1321) for the hot hash loops.
  *
  * The JCA path (`MessageDigest.getInstance("MD5")` + `digest()`)
  * computes the same function but pays per call: provider indirection,
  * engine reset, an internal padding buffer, and a fresh 16-byte result
  * array — measurable when the corpus hashes hundreds of millions of
  * short windows (WindowHash, SimHash, ShingleHashSet burn most of the
  * x/d-family cpu there). This core digests a caller-assembled message
  * buffer with no allocation at all: block mixing reads the message
  * array directly, the tail+padding block lives in a per-thread scratch,
  * and the result comes back as the first bytes/nibbles folded into a
  * long — which is all any caller here ever wanted.
  *
  * Output is BIT-IDENTICAL to MD5 by construction (Md5Spec pins it
  * against JCA on random lengths 0..300); every oracle keeps matching
  * because the hash bytes are the hash bytes.
  */
object Md5 {
  private final class Scratch {
    var sa = 0; var sb = 0; var sc = 0; var sd = 0 // digest state out
    val tail = new Array[Byte](128) // final 1-2 padded blocks
    val msg = new Array[Byte](256) // growable message-assembly buffer
    var msgBuf: Array[Byte] = msg
    def ensure(n: Int): Array[Byte] = {
      if (msgBuf.length < n) {
        var cap = msgBuf.length
        while (cap < n) cap *= 2
        msgBuf = java.util.Arrays.copyOf(msgBuf, cap)
      }
      msgBuf
    }
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  /** Borrow the per-thread message-assembly buffer, grown to `n`
    * bytes. Valid until the next Md5 call on this thread. */
  def buffer(n: Int): Array[Byte] = scratch.get().ensure(n)

  // per-round shift amounts and sine-table constants, RFC 1321
  private val S = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)
  private val K: Array[Int] = Array.tabulate(64)(i =>
    ((1L << 32) * math.abs(math.sin(i + 1.0))).toLong.toInt)

  @inline private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Digest msg[0..len) into the per-thread state fields (read via
    * [[digestByte]]) — no allocation on any path. */
  private def core(msg: Array[Byte], len: Int): Scratch = {
    val scr = scratch.get()
    var a0 = 0x67452301
    var b0 = 0xefcdab89.toInt
    var c0 = 0x98badcfe.toInt
    var d0 = 0x10325476
    // full blocks straight from the message
    val fullBlocks = len / 64
    var blk = 0
    while (blk < fullBlocks) {
      val base = blk * 64
      var a = a0; var b = b0; var c = c0; var d = d0
      var i = 0
      while (i < 64) {
        var f = 0; var g = 0
        if (i < 16) { f = (b & c) | (~b & d); g = i }
        else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
        else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
        else { f = c ^ (b | ~d); g = (7 * i) & 15 }
        val tmp = d
        d = c; c = b
        val sum = a + f + K(i) + le32(msg, base + g * 4)
        b = b + Integer.rotateLeft(sum, S(i))
        a = tmp
        i += 1
      }
      a0 += a; b0 += b; c0 += c; d0 += d
      blk += 1
    }
    // tail + padding (1 or 2 blocks) in the scratch buffer
    val rem = len - fullBlocks * 64
    val t = scr.tail
    System.arraycopy(msg, fullBlocks * 64, t, 0, rem)
    t(rem) = 0x80.toByte
    val padded = if (rem <= 55) 64 else 128
    java.util.Arrays.fill(t, rem + 1, padded - 8, 0.toByte)
    val bitLen = len.toLong * 8
    var i = 0
    while (i < 8) { t(padded - 8 + i) = ((bitLen >>> (8 * i)) & 0xff).toByte; i += 1 }
    var base = 0
    while (base < padded) {
      var a = a0; var b = b0; var c = c0; var d = d0
      var j = 0
      while (j < 64) {
        var f = 0; var g = 0
        if (j < 16) { f = (b & c) | (~b & d); g = j }
        else if (j < 32) { f = (d & b) | (~d & c); g = (5 * j + 1) & 15 }
        else if (j < 48) { f = b ^ c ^ d; g = (3 * j + 5) & 15 }
        else { f = c ^ (b | ~d); g = (7 * j) & 15 }
        val tmp = d
        d = c; c = b
        val sum = a + f + K(j) + le32(t, base + g * 4)
        b = b + Integer.rotateLeft(sum, S(j))
        a = tmp
        j += 1
      }
      a0 += a; b0 += b; c0 += c; d0 += d
      base += 64
    }
    scr.sa = a0; scr.sb = b0; scr.sc = c0; scr.sd = d0
    scr
  }

  /** Digest byte `i` (of the standard 16-byte MD5 output). */
  @inline private def digestByte(st: Scratch, i: Int): Int = {
    val word = (i >> 2) match {
      case 0 => st.sa
      case 1 => st.sb
      case 2 => st.sc
      case _ => st.sd
    }
    (word >>> (8 * (i & 3))) & 0xff
  }

  /** First `nBytes` digest bytes big-endian as a long — identical to
    * WindowHash's fold of `MessageDigest.digest()`. nBytes ≤ 7 keeps it
    * positive. */
  def bytePrefixLong(msg: Array[Byte], len: Int, nBytes: Int): Long = {
    val st = core(msg, len)
    var v = 0L
    var b = 0
    while (b < nBytes) { v = (v << 8) | digestByte(st, b); b += 1 }
    v
  }

  /** First `hexChars` hex NIBBLES as a long (odd widths supported) —
    * identical to SimHash.hexPrefix / Determinism.md5Idx folds. */
  def hexPrefixLong(msg: Array[Byte], len: Int, hexChars: Int): Long = {
    val st = core(msg, len)
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val b = digestByte(st, i / 2)
      val nibble = if (i % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  /** Full 16-byte digest into `out` (offset 0) — for callers that need
    * more than 15 nibbles. */
  def digest(msg: Array[Byte], len: Int, out: Array[Byte]): Unit = {
    val st = core(msg, len)
    var i = 0
    while (i < 16) { out(i) = digestByte(st, i).toByte; i += 1 }
  }
}
