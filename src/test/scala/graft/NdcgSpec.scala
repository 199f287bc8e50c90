package graft

import graft.queries.Similarity

/** s_ndcg equals a naive graded-DCG replay of the two gate relations
  * it joins, and behaves like NDCG: 1.0 iff the ANN ordering equals
  * the exact ordering on that query, monotone with recall.
  */
class NdcgSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("s_ndcg equals a naive replay and is 1.0 exactly on order-perfect queries") {
    val bf = Similarity.queries("s_cosine_topk")(spark, dir).collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("vec_id")) -> r.getAs[Int]("rn"))
      .toMap
    val ann = Similarity.queries("s_ivf_ann")(spark, dir).collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("vec_id"), r.getAs[Int]("rn")))
    val got = Similarity.queries("s_ndcg")(spark, dir).collect()
      .map(r => r.getAs[Long]("q") ->
        (r.getAs[Long]("dcg_scaled"), r.getAs[Long]("ndcg_ppm"))).toMap
    assert(got.keySet == bf.keySet.map(_._1))
    for ((q, rows) <- ann.groupBy(_._1)) {
      val dcg = rows.map { case (_, v, pos) =>
        val grade = bf.get((q, v)).map(6 - _).getOrElse(0).toLong
        grade * Similarity.NdcgDiscPpm(pos - 1)
      }.sum
      assert(got(q)._1 == dcg, s"q=$q dcg")
      assert(got(q)._2 == 1000000L * dcg / Similarity.NdcgIdcg, s"q=$q ndcg")
      assert(got(q)._2 <= 1000000L && got(q)._2 >= 0L)
      // order-perfect retrieval scores exactly the ideal
      val perfect = rows.forall { case (_, v, pos) => bf.get((q, v)).contains(pos) }
      if (perfect) assert(got(q)._2 == 1000000L, s"q=$q perfect but ndcg<1")
    }
    // the unrefined IVF path retrieves about half the graded mass at
    // this tiny scale (measured 458019 ppm) — pin that it stays well
    // above random-junk territory without demanding refine-level order
    val mean = got.values.map(_._2).sum / got.size
    assert(mean > 300000L, s"mean ndcg $mean")
  }
}
