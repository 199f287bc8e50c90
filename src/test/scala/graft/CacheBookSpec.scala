package graft

/** Cache-lifecycle contract: releasing a family's memoized relations
  * must evict the memo entries too, so a later call REBUILDS from
  * source and still produces the same answer (a stale handle over an
  * unpersisted checkpoint would fail — there is no lineage left to
  * recompute from). */
class CacheBookSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("released dedup caches rebuild and d_cluster still matches itself") {
    val q = queries.Dedup.queries("d_cluster")
    val before = q(spark, dir).collect().map(_.toSeq).toSeq
    assert(before.nonEmpty)
    assert(CacheBook.liveScopes(spark).contains("d"))

    CacheBook.releaseAll(spark)
    assert(CacheBook.liveScopes(spark).isEmpty)

    val after = q(spark, dir).collect().map(_.toSeq).toSeq
    assert(after == before)
    // the rebuild re-registered its caches
    assert(CacheBook.liveScopes(spark).contains("d"))
    CacheBook.releaseAll(spark)
  }

  test("released slice memo rebuilds and the manifest still matches") {
    val q = queries.SliceQueries.queries("slice_manifest")
    val before = q(spark, dir).collect().map(_.toSeq).toSeq
    assert(before.nonEmpty)
    CacheBook.release(spark, "slice")
    val after = q(spark, dir).collect().map(_.toSeq).toSeq
    assert(after == before)
    CacheBook.releaseAll(spark)
  }

  test("released similarity memos (IVF index + PQ model) rebuild identically") {
    // guards the round-5 ivfCache/pqCache release path: after release
    // the memo maps must be empty (not holding dead persisted handles)
    // and a re-run rebuilds to the same answer
    val ivf = queries.Similarity.queries("s_ivfpq_ann")
    val before = ivf(spark, dir).collect().map(_.toSeq).toSeq
    assert(before.nonEmpty)
    assert(CacheBook.liveScopes(spark).contains("s"))
    CacheBook.release(spark, "s")
    assert(!CacheBook.liveScopes(spark).contains("s"))
    val after = ivf(spark, dir).collect().map(_.toSeq).toSeq
    assert(after == before)
    assert(CacheBook.liveScopes(spark).contains("s"))
    CacheBook.releaseAll(spark)
  }

  test("release tolerates unknown scopes and double release") {
    CacheBook.release(spark, "no-such-scope")
    CacheBook.releaseAll(spark)
    CacheBook.releaseAll(spark)
  }
}
