package graft

import graft.queries.Dedup

/** d_overlap_inc teeth: KMV mergeability in the engine itself — the
  * standing-sketch-plus-delta merge must produce EXACTLY the
  * from-scratch d_source_overlap result on the real corpus (same
  * session, same memoized shingle relation), for every pair and every
  * column (kk, hits, estimate). The oracle already pins both entries
  * to one SQL; this pins the two ENGINE paths against each other, so a
  * drift in the delta boundary, the unsalted merge window, or the
  * standing build can't hide behind a matching oracle re-derivation. */
class IncOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("incremental sketch merge == from-scratch recompute") {
    val dir = "/root/testdata/sf0.001"
    val full = Dedup.queries("d_source_overlap")(spark, dir)
      .as[(String, String, Long, Long, Long)].collect().toSet
    val inc = Dedup.queries("d_overlap_inc")(spark, dir)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(inc == full)
    assert(full.nonEmpty)
  }
}
