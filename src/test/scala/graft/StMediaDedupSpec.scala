package graft

import org.apache.spark.sql.functions._

/** st_media_dedup teeth: the streaming gate must equal the BATCH
  * incremental path restricted to standing hits — m_phash_inc's pair
  * set with the new-new pairs removed and each remaining pair oriented
  * (new image, standing dup). Any drift between the in-stream decode/
  * hash/band pipeline and the batch one (a different band emit, a
  * missed twin, a chunk packed differently across the micro-batch
  * boundary) breaks set equality. */
class StMediaDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming gate == batch incremental restricted to standing hits") {
    val dir = "/root/testdata/sf0.001"
    val M = graft.queries.MultimodalQueries
    val maxId = graft.Tables.load(spark, dir, "documents")
      .agg(max("doc_id")).head().getLong(0)
    val tNew = maxId * 4 / 5
    def isNew(id: Long) = id % 100000L >= tNew

    val inc = M.queries("m_phash_inc")(spark, dir)
      .as[(Long, Long, Int)].collect()
    val expected = inc.flatMap { case (a, b, d) =>
      (isNew(a), isNew(b)) match {
        case (true, false) => Some((a, b, d))
        case (false, true) => Some((b, a, d))
        case _             => None // new-new: not the gate's job
      }
    }.toSet

    val got = graft.queries.StreamingQueries.queries("st_media_dedup")(spark, dir)
      .as[(Long, Long, Int)].collect().toSet

    assert(expected.nonEmpty, "corpus must produce standing hits")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }
}
