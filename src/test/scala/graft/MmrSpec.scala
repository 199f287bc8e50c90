package graft

/** s_mmr teeth independent of the SQL oracle: the distributed greedy
  * selection must equal a naive in-JVM reference running the SAME
  * integer-micro trajectory — floor(cos*1e6) scores, 7/3 weights,
  * max-over-selected redundancy, identical tie-breaks — on the real
  * sf0.001 corpus. Also pins that diversification has teeth: MMR must
  * reorder at least one query's list vs pure relevance.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // left-to-right sum matches VecOps' unrolled IEEE chain
  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => a(i) * b(i)).reduceLeft(_ + _)

  test("distributed MMR == naive greedy integer trajectory") {
    val dir = "/root/testdata/sf0.001"
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])].collect().toMap
    val norm = vs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def simM(a: Long, b: Long): Long =
      math.floor(dot(vs(a), vs(b)) / (norm(a) * norm(b)) * 1000000.0).toLong

    def poolOf(q: Long): Seq[(Long, Long)] =
      vs.keys.filter(_ != q).toSeq.map(c => (c, simM(q, c)))
        .sortBy { case (c, r) => (-r, c) }.take(10)

    val expected = (0L until 5L).flatMap { q =>
      val pool = poolOf(q)
      var sel = Vector.empty[(Long, Long)] // (vec_id, mmr)
      for (_ <- 1 to 5) {
        val scored = pool
          .filterNot { case (c, _) => sel.exists(_._1 == c) }
          .map { case (c, r) =>
            val red = if (sel.isEmpty) 0L else sel.map(s => simM(c, s._1)).max
            (c, 7L * r - 3L * red)
          }
        sel :+= scored.minBy { case (c, m) => (-m, c) }
      }
      sel.zipWithIndex.map { case ((c, m), i) => (q, i + 1, c, m) }
    }.toSet

    val got = graft.queries.Similarity.queries("s_mmr")(spark, dir)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == expected,
      s"diff=${(got diff expected).take(3)} / ${(expected diff got).take(3)}")

    // the teeth: the redundancy term must actually reorder something —
    // otherwise the operator is an expensive identity on this corpus
    val mmrOrder = expected.toSeq.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    val reordered = (0L until 5L).exists { q =>
      mmrOrder(q) != poolOf(q).take(5).map(_._1)
    }
    assert(reordered,
      "diversification has no teeth: MMR == pure relevance for every query")
    graft.CacheBook.releaseAll(spark)
  }
}
