package graft

import graft.functions.Determinism
import graft.queries.Curation

/** x_weighted_sample: the k smallest key/weight priorities ARE the
  * sample — verified against a naive in-JVM reference computing the
  * same 48-bit keys and the same single IEEE division. Also pins the
  * weighting direction: the sample's mean token mass exceeds the
  * corpus mean (heavier docs are more likely picked). */
class WeightedSampleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sample equals the naive k-smallest-priority set") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong)
      .toMap
    val pri = docs.map { case (id, w) =>
      (id, w, Determinism.jvmMd5Idx(s"wsm#$id", 12).toDouble / w)
    }.toSeq
    val expected = pri.sortBy { case (id, _, p) => (p, id) }
      .take(Curation.SampleK)
      .map { case (id, w, p) => (id, w, p) }.toSet

    val got = Curation.queries("x_weighted_sample")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)

    val sampleMean = expected.toSeq.map(_._2).sum.toDouble / expected.size
    val corpusMean = docs.values.sum.toDouble / docs.size
    assert(sampleMean > corpusMean,
      s"weighting has no teeth: sample mean $sampleMean <= corpus mean $corpusMean")
  }
}
