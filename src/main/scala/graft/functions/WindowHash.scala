package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

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
  *
  * Round 14: hashes through [[Md5]] (zero-allocation core) instead of
  * JCA MessageDigest — each window's bytes are assembled once into the
  * per-thread scratch and digested in place; the UTF8String views are
  * extracted once per ROW, not once per (window, word). Same bytes in,
  * same hash out (Md5Spec pins the core to JCA).
  */
private[functions] object WindowHash {

  def hashWindows(words: ArrayData, k: Int, hexChars: Int): Array[Long] = {
    val n = words.numElements()
    val m = math.max(n - k, 0) + 1
    val out = new Array[Long](m)
    val nBytes = hexChars / 2
    // one UTF8String view per element, reused by the k windows it joins
    val ws = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      ws(j) = if (words.isNullAt(j)) null else words.getUTF8String(j)
      j += 1
    }
    var i = 0
    while (i < m) {
      val end = math.min(i + k, n)
      var len = 0
      var first = true
      var t = i
      while (t < end) {
        if (ws(t) != null) {
          if (!first) len += 1
          len += ws(t).numBytes()
          first = false
        }
        t += 1
      }
      val buf = Md5.buffer(len)
      var pos = 0
      first = true
      t = i
      while (t < end) {
        val u = ws(t)
        if (u != null) {
          if (!first) { buf(pos) = ' '.toByte; pos += 1 }
          u.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
          pos += u.numBytes()
          first = false
        }
        t += 1
      }
      out(i) = Md5.bytePrefixLong(buf, len, nBytes)
      i += 1
    }
    out
  }
}
