package graft

import graft.operators.Multimodal

/** The audio fingerprint near-dup contract (m_audio_near): a
  * perturbed-twin WAV — four samples retouched, REAL encode→decode on
  * both sides — lands within hamming 2 of its base, shares at least
  * one 16-bit chunk (pigeonhole ⇒ the banding always recalls it), and
  * the query finds every base/twin pair. */
class AudioFpSpec extends SparkSpec {

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  test("perturbed twin stays within hamming 2 and always shares a band chunk") {
    for (id <- 0L until 64L) {
      val base = Multimodal.audioFpChunks(Multimodal.syntheticWav(id))
      val twin = Multimodal.audioFpChunks(Multimodal.syntheticWav(id, perturb = true))
      val d = hamming(base, twin)
      assert(d <= 2, s"id=$id twin hamming $d > 2 — retouch escaped its window")
      // pigeonhole at hamming <= 3 over 4 chunks: some chunk identical
      assert(base.zip(twin).exists { case (x, y) => x == y },
        s"id=$id no shared chunk — banding would miss the twin")
    }
  }

  test("delta bits move only where the energy window was touched") {
    // the retouch hits samples 0..3 = inside window 0, so only the two
    // bits that compare against window 0 (bit 0: e0>e1, bit 63: e63>e0)
    // may differ — all other 62 bits must be identical
    for (id <- 0L until 32L) {
      val base = Multimodal.audioFpChunks(Multimodal.syntheticWav(id))
      val twin = Multimodal.audioFpChunks(Multimodal.syntheticWav(id, perturb = true))
      val diff = base.zip(twin).zipWithIndex.flatMap { case ((x, y), ci) =>
        (0 until 16).filter(j => ((x ^ y) >> j & 1L) == 1L).map(ci * 16 + _)
      }
      assert(diff.forall(w => w == 0 || w == 63),
        s"id=$id unexpected flipped bits at ${diff.mkString(",")}")
    }
  }

  test("m_audio_near finds every base/twin pair at gate scale") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val pairs = queries.MultimodalQueries.queries("m_audio_near")(spark, dir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").as[Long].collect()
    val missing = ids.filterNot(id => pairs((id, id + 100000L)))
    assert(missing.isEmpty,
      s"${missing.length} twins not recalled (e.g. ${missing.take(3).mkString(",")})")
    CacheBook.releaseAll(spark)
  }
}
