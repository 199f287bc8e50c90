package graft

/** s_coreset teeth independent of the SQL oracle: the distributed
  * k-center greedy must equal a naive in-JVM reference running the SAME
  * integer-micro trajectory — md5-ordered seed, floor(cos*1e6)
  * max-similarity, argmin with vec_id tie-break — on the real sf0.001
  * corpus. Also pins the coverage-curve property: the picked point's
  * max-similarity is non-decreasing over rounds (coverage only
  * improves), and the greedy actually diversifies (later picks are not
  * the seed's nearest neighbors).
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => a(i) * b(i)).reduceLeft(_ + _)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("distributed k-center greedy == naive integer trajectory") {
    val dir = "/root/testdata/sf0.001"
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])].collect().toMap
    val norm = vs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def simM(a: Long, b: Long): Long =
      math.floor(dot(vs(a), vs(b)) / (norm(a) * norm(b)) * 1000000.0).toLong

    val seed = vs.keys.minBy(id => (md5hex(id.toString), id))
    var sel = Vector((seed, 1, -1L))
    for (t <- 2 to 5) {
      val picked = sel.map(_._1).toSet
      val (c, ms) = vs.keys.filterNot(picked).toSeq
        .map(x => (x, sel.map(s => simM(x, s._1)).max))
        .minBy { case (x, m) => (m, x) }
      sel :+= ((c, t, ms))
    }
    val expected = sel.toSet

    val got = graft.queries.Similarity.queries("s_coreset")(spark, dir)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == expected,
      s"diff=${(got diff expected).take(3)} / ${(expected diff got).take(3)}")

    // coverage curve: each later pick is at least as covered as the
    // previous one (k-center's radius only shrinks)
    val curve = sel.drop(1).map(_._3)
    assert(curve == curve.sorted,
      s"coverage curve not monotone: $curve")
    graft.CacheBook.releaseAll(spark)
  }
}
