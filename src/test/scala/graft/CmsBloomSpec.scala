package graft

import graft.functions.Determinism
import graft.queries.TextAnalysis

/** x_cms_terms / x_bloom_membership: both sketches re-derived by a
  * naive in-JVM reference (same md5 positions, same fold), so the
  * distributed fold, the min-over-rows estimate, and the membership
  * probe are each pinned bit-for-bit — plus the structural contracts:
  * CMS error is one-sided (est >= true, never under) and the Bloom
  * filter admits NO false negative by construction. */
class CmsBloomSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: Seq[(Long, String)] =
    Tables.load(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq

  test("CMS estimates equal the naive sketch and never undercount") {
    val counts = corpus.iterator
      .flatMap(_._2.split(" ", -1))
      .filter(w => !TextAnalysis.stopwords.contains(w) && w.length >= 3)
      .toSeq.groupBy(identity).map { case (t, g) => t -> g.size.toLong }

    // naive D x W sketch: every term folds into one bucket per row
    val sketch = Array.fill(TextAnalysis.CmsD, TextAnalysis.CmsW)(0L)
    for ((t, c) <- counts; i <- 0 until TextAnalysis.CmsD)
      sketch(i)((Determinism.jvmMd5Idx(s"cms$i#$t") % TextAnalysis.CmsW).toInt) += c
    def est(t: String): Long =
      (0 until TextAnalysis.CmsD).map(i =>
        sketch(i)((Determinism.jvmMd5Idx(s"cms$i#$t") % TextAnalysis.CmsW).toInt)).min

    val rows = TextAnalysis.queries("x_cms_terms")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10)
    val expectedTop = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
    assert(rows.map(r => (r._1, r._2)).toSeq == expectedTop)
    for ((t, tc, ec, over) <- rows) {
      assert(ec == est(t), s"term $t: query est $ec != naive sketch ${est(t)}")
      assert(ec >= tc && over == ec - tc,
        s"term $t: one-sided contract broken (true=$tc est=$ec over=$over)")
    }
  }

  test("Bloom membership equals the naive filter and has zero false negatives") {
    val texts = corpus.map(_._2)
    val bits = texts.iterator.flatMap(t => (0 until TextAnalysis.BloomK).map(j =>
      Determinism.jvmMd5Idx(s"bl$j#$t") % TextAnalysis.BloomM)).toSet
    def member(key: String): Boolean =
      (0 until TextAnalysis.BloomK).forall(j =>
        bits(Determinism.jvmMd5Idx(s"bl$j#$key") % TextAnalysis.BloomM))
    val present = texts.toSet

    val byId = corpus.toMap
    val rows = TextAnalysis.queries("x_bloom_membership")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    assert(rows.nonEmpty && rows.length == 2 * corpus.count(_._1 % 10 == 0))
    for ((id, kind, bm, tm, fp) <- rows) {
      val key = if (kind == "novel") byId(id) + "~novel" else byId(id)
      assert(bm == member(key), s"doc $id/$kind: query member $bm != naive")
      assert(tm == present(key), s"doc $id/$kind: true_member mismatch")
      assert(fp == (bm && !tm), s"doc $id/$kind: is_fp not bm && !tm")
      if (kind == "present")
        assert(bm, s"doc $id: FALSE NEGATIVE — present key not admitted")
    }
  }
}
