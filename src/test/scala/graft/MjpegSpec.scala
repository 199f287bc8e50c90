package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The decode-verified video contract's load-bearing facts, pinned:
  * (1) uniform frames survive the JPEG encode→decode round trip
  * EXACTLY at quality 1.0 for every level — the property that lets the
  * md5 level formula stay the cross-engine oracle while the pipeline
  * emits decoded-pixel means; (2) the AVI writer/parser round-trips the
  * frame payloads byte-identically (the container is structure, not a
  * transform); (3) a synthetic video's decoded levels equal the
  * formula, end-to-end through the container. */
class MjpegSpec extends AnyFunSuite {

  test("uniform JPEG frames round-trip exactly at every level (0..255)") {
    val bad = (0 until 256).filterNot { level =>
      Multimodal.decodedFrameLevel(Multimodal.jpegFrame(level)) == level
    }
    assert(bad.isEmpty, s"levels not exact through JPEG: $bad")
  }

  test("AVI container round-trips frame payloads byte-identically") {
    val frames = Seq(17, 200, 3, 254, 128).map(Multimodal.jpegFrame)
    val avi = Multimodal.encodeMjpegAvi(frames, Multimodal.FrameW, Multimodal.FrameH)
    // a real RIFF AVI: magic + declared size match
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val back = Multimodal.mjpegFrames(avi)
    assert(back.length == frames.length)
    back.zip(frames).foreach { case (b, f) => assert(b.sameElements(f)) }
    // odd-length payloads exercise the RIFF even-padding rule
    val odd = frames.map(f => f :+ 0xd9.toByte) // still parses as bytes
    val avi2 = Multimodal.encodeMjpegAvi(odd, 16, 16)
    Multimodal.mjpegFrames(avi2).zip(odd).foreach { case (b, f) =>
      assert(b.sameElements(f))
    }
  }

  test("synthetic video decodes to the md5 formula levels through the container") {
    def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map(b => f"$b%02x").mkString
    def idx6(hex: String): Long = java.lang.Long.parseLong(hex.take(6), 16)
    val h = md5Hex("a real video's content hash".getBytes("UTF-8"))
    val n = (1 + idx6(md5Hex((h + "f").getBytes("UTF-8"))) % 64).toInt
    val got = Multimodal.mjpegFrames(Multimodal.syntheticMjpeg(h))
      .map(Multimodal.decodedFrameLevel)
    val want = (0 until n).map(i =>
      (idx6(md5Hex((h + "#" + i).getBytes("UTF-8"))) % 256).toInt)
    assert(got == want)
  }
}
