package graft

import graft.queries.Dedup

/** d_edit_dup's verify contract: every reported pair actually passes
  * the integer-mills normalized-Levenshtein predicate (recomputed
  * in-JVM against the raw texts), and the band-candidate generation
  * recalls the Jaccard-verified near-dups on this corpus (their
  * normalized distances sit far under the 30% threshold). */
class FuzzyDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    var prev = (0 to b.length).toArray
    for (i <- 1 to a.length) {
      val cur = new Array[Int](b.length + 1)
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(b.length)
  }

  test("reported pairs pass the exact threshold; minhash near-dups are recalled") {
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Dedup.queries("d_edit_dup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.nonEmpty)
    got.foreach { case (a, b, dist, maxlen) =>
      assert(dist == lev(texts(a), texts(b)), s"distance mismatch on ($a,$b)")
      assert(maxlen == math.max(texts(a).length, texts(b).length))
      assert(dist * 1000 <= maxlen * 300, s"($a,$b) over threshold")
    }
    val pairs = got.map(p => (p._1, p._2)).toSet
    val mh = Dedup.queries("d_minhash_lsh")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(pairs),
      "every Jaccard-verified near-dup must pass the 30% edit verify on this corpus")
  }
}
