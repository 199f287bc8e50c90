package graft

import graft.queries.TextAnalysis
import org.apache.spark.sql.functions._

/** Teeth for x_heaps beyond the full oracle: the checkpoint fan-out's
  * integer kmin must cover each row in EXACTLY the checkpoints whose
  * id-cut reaches it — so the k=10 row must equal the naive whole-
  * corpus totals, and the curve must be monotone (a checkpoint sees a
  * superset of every earlier one). An off-by-one in the ⌈10q/m⌉
  * closed form would shift a decile boundary and die here.
  */
class HeapsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("x_heaps' final checkpoint equals naive corpus totals, curve monotone") {
    val rows = TextAnalysis.queries("x_heaps")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1 to 10))

    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val nDocs = d.count()
    val nTokens = d.select(sum(size(col("w")))).collect()(0).getLong(0)
    val vocab = d.select(explode(col("w")).as("t")).distinct().count()
    val maxId = d.agg(max("doc_id")).collect()(0).getLong(0)

    val last = rows.last
    assert(last._2 == maxId, "k=10 cut is not the max doc_id")
    assert(last._3 == nDocs && last._4 == nTokens && last._5 == vocab,
      s"final checkpoint ${last} != naive ($nDocs, $nTokens, $vocab)")

    // each checkpoint's population is a superset of the previous one's
    for (Array(a, b) <- rows.sliding(2)) {
      assert(b._2 > a._2, "cut ids not strictly increasing")
      assert(b._3 >= a._3 && b._4 >= a._4 && b._5 >= a._5,
        s"curve not monotone between k=${a._1} and k=${b._1}")
    }
    // vocabulary grows sublinearly in tokens past the first checkpoint:
    // new-type rate per token must fall (Heaps with beta < 1) — a weak
    // sanity floor that catches a fan-out duplicating first-ids
    val head = rows.head
    assert(head._5 > 0 && head._5 <= vocab)
  }

  test("x_simpson equals a naive BigInt collision-probability replay") {
    val terms = Tables.load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val got = TextAnalysis.queries("x_simpson")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val bySrc = terms.groupBy(_._1)
    assert(got.keySet == bySrc.keySet)
    for ((src, g) <- bySrc) {
      val counts = g.groupBy(_._2).map(_._2.length)
      val n = BigInt(g.length)
      val coll = counts.map(c => BigInt(c) * (c - 1)).sum
      val (nTokens, nTypes, ppm) = got(src)
      assert(nTokens == g.length && nTypes == counts.size)
      assert(BigInt(ppm) == BigInt(1000000) * coll / (n * (n - 1)),
        s"$src: $ppm")
      assert(ppm >= 0 && ppm < 1000000)
    }
  }
}
