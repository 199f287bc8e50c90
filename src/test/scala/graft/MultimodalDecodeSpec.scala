package graft

import graft.operators.Multimodal

/** The real-decode contract behind m_decode: ImageIO round-trips the
  * synthetic 8-bit grayscale PNGs losslessly, and every decoded value
  * matches the pixel formula the oracle recomputes. */
class MultimodalDecodeSpec extends SparkSpec {

  private def gray(id: Long, x: Int, y: Int): Long = (id + 3L * x + 5L * y) % 256

  test("decodePng(syntheticPng(id)) matches the pixel-formula reference") {
    for (id <- Seq(0L, 1L, 7L, 31L, 255L, 9999L)) {
      val w = (16 + id % 32).toInt
      val h = (16 + (id * 7) % 32).toInt
      val d = Multimodal.decodePng(id, Multimodal.syntheticPng(id), target = 64)
      assert(d.width == w && d.height == h)
      val sum = (for (y <- 0 until h; x <- 0 until w) yield gray(id, x, y)).sum
      assert(d.mean_gray == (sum * 1000000L / (w.toLong * h)) / 1000000.0)
      val m = math.max(w, h)
      val ow = math.max(1, w * 64 / m)
      val oh = math.max(1, h * 64 / m)
      assert(d.out_w == ow && d.out_h == oh)
      val rsum = (for (j <- 0 until oh; i <- 0 until ow)
        yield gray(id, i * w / ow, j * h / oh)).sum
      assert(d.resized_mean_gray == (rsum * 1000000L / (ow.toLong * oh)) / 1000000.0)
    }
  }

  test("PNG encode is a real ImageIO artifact (magic bytes) and decode is lossless") {
    val bytes = Multimodal.syntheticPng(42L)
    assert(bytes.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), "PNG signature")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      assert(img.getRaster.getSample(x, y, 0) == gray(42L, x, y).toInt)
  }

  test("decodeSynthetic runs distributed with the batched partition shape") {
    import SparkSpec.session.implicits._
    val ids = SparkSpec.session.range(0, 200).select($"id".as("doc_id")).as[Long]
    val out = Multimodal.decodeSynthetic(ids).collect()
    assert(out.length == 200)
    val d7 = out.find(_.doc_id == 7L).get
    assert(d7 == Multimodal.decodePng(7L, Multimodal.syntheticPng(7L), 64))
  }

  test("phashPng matches the thumbnail-formula reference on decoded pixels") {
    for (id <- Seq(0L, 3L, 77L, 511L)) {
      val w = (16 + id % 32).toInt
      val h = (16 + (id * 7) % 32).toInt
      val p = (0 until 64).map(k => gray(id, (k % 8) * w / 8, (k / 8) * h / 8))
      val sum = p.sum
      val want = p.map(v => if (v * 64 > sum) '1' else '0').mkString
      assert(Multimodal.phashPng(Multimodal.syntheticPng(id)) == want)
    }
  }

  test("ids congruent mod 256 render identical images and share a phash") {
    // w depends on id mod 32, h on id mod 32 (via *7), pixels on id
    // mod 256 — so id and id+256 are bit-identical images: the dup
    // groups m_phash finds are REAL decoded-pixel duplicates
    assert(Multimodal.syntheticPng(5L).toSeq == Multimodal.syntheticPng(261L).toSeq)
    assert(Multimodal.phashPng(Multimodal.syntheticPng(5L)) ==
      Multimodal.phashPng(Multimodal.syntheticPng(261L)))
    // and a non-congruent pair does not (differing dims force it)
    assert(Multimodal.phashPng(Multimodal.syntheticPng(5L)) !=
      Multimodal.phashPng(Multimodal.syntheticPng(6L)))
  }
}
