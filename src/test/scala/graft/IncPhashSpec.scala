package graft

/** The incremental contract for media near-dup (m_phash_inc): the
  * delta-bounded banded probe must produce EXACTLY the full
  * m_phash_near pair set restricted to pairs with at least one new
  * endpoint — incremental == recompute, the d_incremental /
  * IngestLoopSpec equivalence applied to the m family. */
class IncPhashSpec extends SparkSpec {
  import spark.implicits._

  test("m_phash_inc == m_phash_near pairs with >= 1 new endpoint") {
    val dir = "/root/testdata/sf0.001"
    val tNew = spark.read.parquet(s"$dir/documents.parquet")
      .agg(org.apache.spark.sql.functions.max("doc_id")).head().getLong(0) * 4 / 5

    val full = queries.MultimodalQueries.queries("m_phash_near")(spark, dir)
      .as[(Long, Long, Int)].collect()
      .filter { case (a, b, _) => a % 100000L >= tNew || b % 100000L >= tNew }
      .toSet
    val inc = queries.MultimodalQueries.queries("m_phash_inc")(spark, dir)
      .as[(Long, Long, Int)].collect()
    assert(inc.length == inc.toSet.size, "incremental emitted a pair twice")
    assert(inc.toSet == full,
      s"inc=${inc.length} fullRestricted=${full.size}; " +
        s"missing=${(full diff inc.toSet).take(3)} extra=${(inc.toSet diff full).take(3)}")
    // and the delta is a real subset: some old-old pairs exist and are excluded
    val all = queries.MultimodalQueries.queries("m_phash_near")(spark, dir)
      .as[(Long, Long, Int)].collect()
    assert(all.length > full.size, "gate data has no old-old pairs — the filter is vacuous")
    CacheBook.releaseAll(spark)
  }
}
