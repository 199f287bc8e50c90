package graft

import org.apache.spark.sql.functions._

/** m_scene_dedup_inc teeth (the IncPhashSpec contract on the video
  * modality): the delta-bounded probe of the shared scene-fingerprint
  * memo must equal the FULL m_scene_dedup recompute restricted to
  * pairs with at least one new video — same pairs, same scene ids,
  * same distances. A drift in the novelty recovery (twins share their
  * base's novelty through the (sid div 1000) % 100000 decode), the
  * emit-once predicate, or the shared memo breaks set equality. */
class IncSceneSpec extends SparkSpec {
  import spark.implicits._

  test("incremental == full recompute restricted to new-video pairs") {
    val dir = "/root/testdata/sf0.001"
    val M = graft.queries.MultimodalQueries
    val maxId = graft.Tables.load(spark, dir, "documents")
      .agg(max("doc_id")).head().getLong(0)
    val tNew = maxId * 4 / 5
    def isNew(video: Long) = video % 100000L >= tNew

    val full = M.queries("m_scene_dedup")(spark, dir)
      .as[(Long, Int, Long, Int, Int)].collect()
    val expected = full.filter(r => isNew(r._1) || isNew(r._3)).toSet
    val got = M.queries("m_scene_dedup_inc")(spark, dir)
      .as[(Long, Int, Long, Int, Int)].collect().toSet

    assert(expected.nonEmpty, "corpus must produce new-video pairs")
    assert(expected.size < full.length,
      "restriction must be proper (old-old pairs exist)")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }
}
