package graft

import graft.queries.Similarity

/** s_ppr teeth independent of the SQL oracle: the engine result on the
  * real sf0.001 corpus must equal a naive in-JVM personalized PageRank
  * running the SAME trajectory — md5-drawn centroids, argmax-cosine
  * cells, NProbe probes, top-KnnK KNN edges, then PprIters integer
  * rounds of pr div deg contributions with the 0.15 restart mass on the
  * seed only and a sparse (> 0) frame — ranked (pr desc, vec_id asc),
  * top PprK per seed. Also pins the restart property: the seed itself
  * carries its restart mass every round (rank-stable), and scores are
  * strictly positive. */
class PprSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val NQ = 5
  private val NProbe = 2
  // read the engine constant so an env override cannot desync the
  // naive reference from the trajectory under test
  private def kOf(n: Long) = graft.queries.Similarity.kFor(n)
  private val KnnK = 3
  private val Iters = 3
  private val K = 10

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => a(i) * b(i)).reduceLeft(_ + _)

  test("s_ppr == naive integer random-walk-with-restart on the KNN graph") {
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])].collect().toMap
    val norm = vs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def cos(a: Long, b: Long): Double = dot(vs(a), vs(b)) / (norm(a) * norm(b))

    val cents = vs.keys.toSeq.sortBy(id => (md5Hex(id.toString), id)).take(kOf(vs.size))
    def nearestCells(id: Long, n: Int): Seq[Long] =
      cents.map(c => (c, cos(id, c))).sortBy { case (c, s) => (-s, c) }
        .take(n).map(_._1)
    val cellOf: Map[Long, Long] = vs.keys.map(id => id -> nearestCells(id, 1).head).toMap

    // top-KnnK KNN edges off the probed cells
    val edges: Map[Long, Seq[Long]] = vs.keys.map { src =>
      val probed = nearestCells(src, NProbe).toSet
      src -> vs.keys.filter(id => id != src && probed(cellOf(id))).toSeq
        .map(id => (id, cos(src, id))).sortBy { case (id, s) => (-s, id) }
        .take(KnnK).map(_._1)
    }.toMap
    val deg: Map[Long, Long] = edges.view.mapValues(_.size.toLong).toMap

    val expected = (0L until NQ).flatMap { q =>
      var pr = Map[Long, Long](q -> 1000000L)
      for (_ <- 1 to Iters) {
        val contrib = collection.mutable.Map.empty[Long, Long]
        for ((u, p) <- pr; v <- edges(u))
          contrib(v) = contrib.getOrElse(v, 0L) + p / deg(u)
        val next = collection.mutable.Map.empty[Long, Long]
        for ((v, sv) <- contrib) next(v) = 850L * sv / 1000L
        next(q) = next.getOrElse(q, 0L) + 150000L
        pr = next.toMap.filter(_._2 > 0)
      }
      pr.toSeq.sortBy { case (v, p) => (-p, v) }.take(K).zipWithIndex
        .map { case ((v, p), i) => (q, v, p, i + 1) }
    }.toSet

    val got = Similarity.queries("s_ppr")(spark, dir)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == expected)

    // restart property: every seed appears in its own ranking with a
    // score carrying at least the restart mass; all scores positive
    val seedRows = got.filter { case (q, v, _, _) => q == v }
    assert(seedRows.size == NQ)
    assert(seedRows.forall(_._3 >= 150000L))
    assert(got.forall(_._3 > 0L))
  }
}
