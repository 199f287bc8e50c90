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

  test("blurPng moments match the pixel-formula Laplacian reference") {
    for (id <- Seq(0L, 3L, 17L, 100L, 4242L)) {
      val w = (16 + id % 32).toInt
      val h = (16 + (id * 7) % 32).toInt
      val b = Multimodal.blurPng(id, Multimodal.syntheticPng(id))
      val ls = for (y <- 1 until h - 1; x <- 1 until w - 1) yield
        4 * gray(id, x, y) - gray(id, x - 1, y) - gray(id, x + 1, y) -
          gray(id, x, y - 1) - gray(id, x, y + 1)
      assert(b.n_lap == ls.length, s"id $id n")
      assert(b.s_lap == ls.sum, s"id $id sum")
      assert(b.s_lap2 == ls.map(l => l * l).sum, s"id $id sum2")
      // the linear gradient has zero Laplacian except at mod-256 wrap
      // edges — so the variance is nonzero but edge-dominated
      val n = ls.length.toLong
      val v = (n * b.s_lap2 - b.s_lap * b.s_lap) / (n * n)
      assert(v >= 0, s"id $id var $v")
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

  test("WAV encode is a real RIFF artifact and decode matches the sample formula") {
    for (id <- Seq(0L, 7L, 300L, 499L)) {
      val bytes = Multimodal.syntheticWav(id)
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
      val n = (256 + (id * 13) % 512).toInt
      val samples = (0 until n).map(i => (((id + 11L * i) % 65536L) - 32768L).toInt)
      val d = Multimodal.decodeWav(id, bytes)
      assert(d.n_samples == n && d.sample_rate == 8000)
      assert(d.peak_abs == samples.map(math.abs).max)
      val sa = samples.map(v => math.abs(v).toLong).sum
      assert(d.mean_abs == (sa * 1000000L / n) / 1000000.0)
      assert(d.mean_square == samples.map(v => v.toLong * v).sum / n)
    }
  }

  test("decodeSyntheticWav runs distributed with the batched partition shape") {
    import SparkSpec.session.implicits._
    val ids = SparkSpec.session.range(0, 150).select($"id".as("doc_id")).as[Long]
    val out = Multimodal.decodeSyntheticWav(ids).collect()
    assert(out.length == 150)
    val d9 = out.find(_.doc_id == 9L).get
    assert(d9 == Multimodal.decodeWav(9L, Multimodal.syntheticWav(9L)))
  }

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    (0 until 4).map(i => java.lang.Long.bitCount(a(i) ^ b(i))).sum

  test("phashChunks packs the 64 bits little-endian per 16-bit chunk") {
    for (id <- Seq(0L, 3L, 77L, 511L)) {
      val bits = Multimodal.phashPng(Multimodal.syntheticPng(id))
      val ch = Multimodal.phashChunks(Multimodal.syntheticPng(id))
      for (k <- 0 until 64)
        assert(((ch(k / 16) >> (k % 16)) & 1L) ==
          (if (bits.charAt(k) == '1') 1L else 0L), s"id=$id bit $k")
    }
  }

  test("the retouched twin is a GENUINE near-duplicate: 0 < hamming <= 3 exists") {
    // the one-pixel perturbation must produce pairs that exact-hash
    // dedup misses and hamming-banding catches — the whole point of
    // m_phash_near's gate data
    val dists = (0L until 64L).map { id =>
      hamming(Multimodal.phashChunks(Multimodal.syntheticPng(id)),
        Multimodal.phashChunks(Multimodal.syntheticPng(id, perturb = true)))
    }
    assert(dists.exists(d => d > 0 && d <= 3),
      s"no near-twin in 0..63 (dists: ${dists.distinct.sorted})")
    assert(dists.forall(_ <= 8), "retouch must stay a NEAR dup, not a rewrite")
  }

  test("m_phash_near banding finds EXACTLY the brute-force hamming<=3 pairs") {
    // pigeonhole completeness: hamming <= 3 over 4 chunks forces at
    // least one identical chunk, so the band join misses nothing; the
    // verify filter drops everything else — band-recall is 1.0 at t=3
    import SparkSpec.session.implicits._
    val n = 96L
    val corpus = (0L until n).flatMap { id =>
      Seq(id -> Multimodal.phashChunks(Multimodal.syntheticPng(id)),
        (id + 100000L) -> Multimodal.phashChunks(
          Multimodal.syntheticPng(id, perturb = true)))
    }
    val brute = (for {
      (a, ca) <- corpus; (b, cb) <- corpus
      if a < b && hamming(ca, cb) <= 3
    } yield (a, b, hamming(ca, cb))).toSet
    assert(brute.nonEmpty)
    val ph = Multimodal.phashNearCorpus(
      SparkSpec.session.range(0, n).select($"id".as("doc_id")).as[Long]).toDF()
    val chunks = ph.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("c0"),
        org.apache.spark.sql.functions.col("c1"),
        org.apache.spark.sql.functions.col("c2"),
        org.apache.spark.sql.functions.col("c3"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.array((0 to 3).map(ci =>
            org.apache.spark.sql.functions.struct(
              org.apache.spark.sql.functions.lit(ci).as("ci"),
              org.apache.spark.sql.functions.col(s"c$ci").as("cv"))): _*)).as("ch"))
      .select("doc_id", "c0", "c1", "c2", "c3", "ch.ci", "ch.cv")
    import org.apache.spark.sql.functions.{bit_count, col}
    val got = chunks.as("x").join(chunks.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        (0 to 3).map(ci => bit_count(col(s"x.c$ci")
          .bitwiseXOR(col(s"y.c$ci")))).reduce(_ + _).cast("int").as("dist"))
      .distinct()
      .filter(col("dist") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
  }

  test("the m_phash_near QUERY (rep-collapsed banding) == brute-force pairs") {
    // the registered query collapses exact-hash groups before banding
    // (reps band with lowest-matching-band emit, members expand at
    // output) — assert the END RESULT is still exactly the brute-force
    // hamming<=3 pair set, including the dist column, driving the same
    // entry the gate runs
    import SparkSpec.session.implicits._
    val n = 96L
    val tmp = java.nio.file.Files.createTempDirectory("phash_near_q").toString
    SparkSpec.session.range(0, n).select($"id".as("doc_id"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val corpus = (0L until n).flatMap { id =>
      Seq(id -> Multimodal.phashChunks(Multimodal.syntheticPng(id)),
        (id + 100000L) -> Multimodal.phashChunks(
          Multimodal.syntheticPng(id, perturb = true)))
    }
    val brute = (for {
      (a, ca) <- corpus; (b, cb) <- corpus
      if a < b && hamming(ca, cb) <= 3
    } yield (a, b, hamming(ca, cb))).toSet
    val got = SparkEntry.queries("m_phash_near")(SparkSpec.session, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
    // and the within-group legs really contribute: identical-hash dup
    // pairs (dist 0) exist in this corpus and must all be present
    assert(brute.exists(_._3 == 0) && got.exists(_._3 == 0))
    graft.CacheBook.release(SparkSpec.session, "m")
  }
}
