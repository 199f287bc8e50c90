package graft

import graft.queries.Dedup

/** d_semdedup's decision semantics: on the twin corpus the ONLY
  * cosine>=tau pairs are (original, its twin), so every dropped vector
  * must be a twin, kept exactly by its own original, with exactly one
  * close neighbor — and the misses must be exclusively cross-cell
  * (the documented cluster-scope approximation). */
class SemDedupSpec extends SparkSpec {

  test("drop list = twins co-celled with their original, dup_of = the original") {
    val rows = Dedup.queries("d_semdedup")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vecId, dupOf, nClose) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(vecId >= 100000L, s"only twins may be dropped, got $vecId")
      assert(dupOf == vecId - 100000L,
        s"twin $vecId must be kept by its own original, got $dupOf")
      assert(nClose == 1)
    }
    // cluster scope misses SOME twins (different cell than their
    // original) but must catch the bulk — at sf0.001 the corpus has
    // 500 twins
    assert(rows.length > 400 && rows.length <= 500,
      s"expected most of the 500 twins dropped, got ${rows.length}")
  }
}
