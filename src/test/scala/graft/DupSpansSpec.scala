package graft


import graft.queries.TextAnalysis

/** x_dup_spans semantics: a span counts as duplicated only when it
  * appears in >= 2 DISTINCT documents — within-doc repetition alone
  * must not fire (that's x_repetition's job) — and a full-copy pair
  * reports dup_frac 1.0 on both members. */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private val W = 13

  test("cross-document spans fire; within-doc repetition does not") {
    def words(n: Int, tag: String): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val shared = words(20, "s") // 20 words: 8 windows of 13
    val d0 = shared // full copy...
    val d1 = shared // ...of d0
    val d2 = words(6, "u") + " " + words(6, "u") // repeats ITSELF only
    val d3 = words(30, "v") // unique long doc
    val d4 = words(5, "w") // short doc: one whole-doc window
    val docs = Seq(0L -> d0, 1L -> d1, 2L -> d2, 3L -> d3, 4L -> d4)
      .toDF("doc_id", "text")
    // drive the REAL pipeline the gate query runs, on a crafted frame
    val got = TextAnalysis.dupSpans(docs, W).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((8, 8, 1.0)) && got(1L) == ((8, 8, 1.0)),
      "full-copy pair: every window duplicated")
    // d2's windows repeat within the doc (u0..u5 u0..u5 has only one
    // distinct 13-window anyway: 13 words total = 1 window) — df is 1
    assert(got(2L)._2 == 0, "within-doc repetition is not cross-doc dup")
    assert(got(3L) == ((18, 0, 0.0)), "unique doc: no dups")
    assert(got(4L) == ((1, 0, 0.0)), "short doc: one whole-doc window")
  }
}
