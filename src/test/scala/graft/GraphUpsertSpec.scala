package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

/** s_graph_upsert teeth: a vector added WITHOUT a rebuild becomes
  * REACHABLE through the upserted edges. A purely random corpus is not
  * navigable (the fixed-seed walk is priced by the recall entry, not
  * asserted), so the plant isolates the insert mechanics from walk
  * luck: query 0's vector sits next to a deterministic SEARCH SEED
  * (the md5-ordered entry points), and the new twin sits next to the
  * query. The insert walk's initial beam always contains every seed,
  * so the twin must link to that seed; the reverse edge must survive
  * the prune (cos ≈ 0.999 against random ≈ 0.2 edges); and the search
  * walk's first expansion from that seed must surface the twin at
  * rank 1. A failure in any of the three steps — linking, reverse
  * pruning, or searching the merged edges — breaks the assertion. */
class GraphUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("a planted new twin links to its seed and surfaces at rank 1") {
    val rnd = new Random(20260815L)
    val dim = 64
    def vec(): Array[Float] = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    // ids 0..79 old (tNew = 100*4/5 = 80), 80..100 new
    val oldIds = (0L to 79L)
    // the search seeds the walk will use: md5-ordered first 4 old ids
    val seedId = oldIds.sortBy(i => (md5hex(i.toString), i)).head
    val base = oldIds.map(i => i -> vec()).toMap
    val seedVec = base(seedId)
    def near(v: Array[Float], eps: Float): Array[Float] =
      v.zipWithIndex.map { case (x, i) => if (i == 0) x + eps else x }
    // query 0 hugs the seed; the planted NEW twin (id 99) hugs query 0
    val withQ =
      if (seedId == 0L) base else base.updated(0L, near(seedVec, 0.05f))
    val q0 = withQ(0L)
    val newRows = (80L to 100L).map {
      case 99L => (99L, near(q0, 0.01f).toSeq, 9)
      case i   => (i, vec().toSeq, i.toInt % 4)
    }
    val all = withQ.toSeq.sortBy(_._1)
      .map { case (i, v) => (i, v.toSeq, i.toInt % 4) } ++ newRows
    val dir = Files.createTempDirectory("graphup").toString
    all.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val res = graft.queries.Similarity.queries("s_graph_upsert")(spark, dir)
      .as[(Long, Long, Double, Int)].collect()
    val got = res.filter(_._1 == 0L).sortBy(_._4)
    assert(got.nonEmpty, "query 0 returned nothing")
    assert(got.head._2 == 99L && got.head._3 > 0.99,
      s"planted new twin 99 not at rank 1 — got ${got.toSeq}")
  }
}
