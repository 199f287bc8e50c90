package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Md5

/** Pins graft.functions.Md5 bit-exactly to JCA MD5 across message
  * lengths that cover every padding branch (empty, <55, =55, 56..63,
  * =64, multi-block, 119/120 two-block padding edge) and random bytes,
  * plus the byte/nibble prefix folds the hash loops consume. */
class Md5Spec extends AnyFunSuite {

  private def jca(msg: Array[Byte], len: Int): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(java.util.Arrays.copyOf(msg, len))

  test("digest equals JCA on every padding branch and random input") {
    val rnd = new scala.util.Random(141)
    val lengths = (0 to 130) ++ Seq(255, 256, 300, 1024, 4096)
    val out = new Array[Byte](16)
    for (len <- lengths; _ <- 1 to 3) {
      val msg = new Array[Byte](len + 7)
      rnd.nextBytes(msg)
      Md5.digest(msg, len, out)
      assert(out.toSeq == jca(msg, len).toSeq, s"len=$len")
    }
  }

  test("byte/nibble prefix folds match the JCA digest folds") {
    val rnd = new scala.util.Random(142)
    for (_ <- 1 to 200) {
      val len = rnd.nextInt(90)
      val msg = new Array[Byte](len)
      rnd.nextBytes(msg)
      val dig = jca(msg, len)
      val nBytes = 1 + rnd.nextInt(6)
      var vb = 0L
      (0 until nBytes).foreach(b => vb = (vb << 8) | (dig(b) & 0xffL))
      assert(Md5.bytePrefixLong(msg, len, nBytes) == vb)
      val hexChars = 1 + rnd.nextInt(15)
      var vh = 0L
      (0 until hexChars).foreach { i =>
        val b = dig(i / 2) & 0xff
        vh = (vh << 4) | (if (i % 2 == 0) b >>> 4 else b & 0xf)
      }
      assert(Md5.hexPrefixLong(msg, len, hexChars) == vh)
    }
  }
}
