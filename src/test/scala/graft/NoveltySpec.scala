package graft

import org.apache.spark.sql.functions._

import graft.functions.Determinism

/** x_novelty equals a naive first-seen walk over the collected corpus:
  * per doc, distinct 5-gram hashes; a gram is novel iff no
  * smaller-doc_id document contains it. Conservation: summed novel
  * grams == global distinct grams (every gram is first seen exactly
  * once), and doc 0's novelty is 1.0 by construction.
  */
class NoveltySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("x_novelty equals a naive first-seen replay and conserves grams") {
    val texts = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def grams(t: String): Set[Long] = {
      val w = t.split(" ", -1)
      val n = math.max(w.length - 5, 0) + 1
      (0 until n).map(i =>
        Determinism.jvmMd5Idx(w.slice(i, i + 5).mkString(" "), 12)).toSet
    }
    val docGrams = texts.map { case (id, t) => id -> grams(t) }
    val firstSeen = collection.mutable.Map.empty[Long, Long]
    for ((id, gs) <- docGrams; g <- gs) if (!firstSeen.contains(g)) firstSeen(g) = id
    val got = SparkEntry.queries("x_novelty")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    assert(got.keySet == docGrams.map(_._1).toSet)
    for ((id, gs) <- docGrams) {
      val novel = gs.count(g => firstSeen(g) == id)
      val (ng, nv, ppm) = got(id)
      assert(ng == gs.size, s"doc $id n_grams")
      assert(nv == novel, s"doc $id n_novel")
      assert(ppm == 1000000L * novel / gs.size, s"doc $id ppm")
    }
    // conservation: every distinct gram is first-seen exactly once
    assert(got.values.map(_._2.toLong).sum == firstSeen.size)
    assert(got(texts.head._1)._3 == 1000000L, "doc 0 must be fully novel")
  }
}
