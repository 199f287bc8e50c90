package graft

import graft.queries.Similarity

/** s_bm25 equals a naive in-JVM BM25 (rational-IDF variant) computed
  * with the exact same IEEE op sequence: per-term contributions floor
  * to integer micro-units, per-doc sums are order-free longs, ranking
  * ties break on doc id. Confirms the column pipeline implements the
  * scoring formula — the DuckDB oracle then holds it cross-engine. */
class Bm25Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val K1 = 1.2
  private val B = 0.75
  private val K = 5
  private val NQueries = 5

  test("column pipeline matches the naive scored ranking exactly") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).filter(_.nonEmpty).toSeq)
      .toMap
    val tf: Map[(Long, String), Long] = docs.toSeq
      .flatMap { case (id, ws) => ws.map(w => (id, w)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val dl: Map[Long, Long] = docs.map { case (id, ws) => id -> ws.size.toLong }
    val df: Map[String, Long] = tf.keys.toSeq
      .groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val nDocs = dl.size.toLong
    val avgdl = dl.values.sum.toDouble / nDocs.toDouble

    def contrib(q: Long, id: Long, w: String): Long = {
      val t = tf((id, w))
      val idf = (nDocs - df(w) + 0.5) / (df(w) + 0.5)
      val den = t + K1 * ((1 - B) + B * (dl(id) / avgdl))
      math.floor(((idf * (t * 2.2)) / den) * 1000000.0).toLong
    }

    val expected = (0L until NQueries).flatMap { q =>
      val qws = docs(q).distinct
      val scored = docs.keys.filter(_ != q).toSeq.flatMap { id =>
        val s = qws.filter(w => tf.contains((id, w))).map(w => contrib(q, id, w)).sum
        if (qws.exists(w => tf.contains((id, w)))) Some(id -> s) else None
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(K).zipWithIndex
        .map { case ((id, s), i) => (q, i + 1, id, s) }
    }.toSet

    val got = Similarity.queries("s_bm25")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    // teeth: scores differ within a query's top-K somewhere (the
    // ranking is not a constant-score tie parade)
    assert(expected.groupBy(_._1).exists(_._2.map(_._4).size > 1))
  }
}
