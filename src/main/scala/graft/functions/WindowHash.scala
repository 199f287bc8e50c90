package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** The one window-hash loop behind [[ShingleHashes]] (positional) and
  * [[ShingleHashSet]] (sorted-distinct): element `i` of the result is
  * the hash of window `words[i..i+k-1]` — every window in order, short
  * tail windows included, at least one window per input. Hash = first
  * `hexChars` hex chars of md5(utf8 of the space-joined window) = first
  * hexChars/2 digest bytes big-endian, exactly the `md5IdxK` /
  * `concat_ws(' ', slice(...))` Column formula both expressions
  * document.
  *
  * Null elements are SKIPPED, matching `concat_ws` (which drops null
  * arguments without emitting a separator), so the hashes stay equal to
  * the documented Column formula even on arrays with containsNull=true.
  */
private[functions] object WindowHash {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hashWindows(words: ArrayData, k: Int, hexChars: Int): Array[Long] = {
    val n = words.numElements()
    val m = math.max(n - k, 0) + 1
    val md = digests.get()
    val out = new Array[Long](m)
    val nBytes = hexChars / 2
    var i = 0
    while (i < m) {
      md.reset()
      val end = math.min(i + k, n)
      var j = i
      var first = true
      while (j < end) {
        if (!words.isNullAt(j)) {
          if (!first) md.update(' '.toByte)
          md.update(words.getUTF8String(j).getBytes)
          first = false
        }
        j += 1
      }
      val dig = md.digest()
      var v = 0L
      var b = 0
      while (b < nBytes) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      out(i) = v
      i += 1
    }
    out
  }
}
