package graft

/** s_graph_rank teeth independent of the SQL oracle: the distributed
  * power iteration must equal a naive in-JVM reference running the
  * SAME integer-micro floor-division trajectory over the same edge
  * list — same damping, same dangling-mass drop, same missing-inlink
  * base case — on the real sf0.001 corpus. */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  test("distributed rank == naive integer power iteration on the knn edges") {
    val dir = "/root/testdata/sf0.001"
    val edges = graft.queries.Similarity.queries("s_knn_graph")(spark, dir)
      .select("src", "nbr").as[(Long, Long)].collect()
    val ids = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").as[Long].collect().sorted
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var pr = ids.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val sv = edges.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => pr(s) / deg(s) }.sum).toMap
      pr = ids.map(v => v -> (150000L + 850L * sv.getOrElse(v, 0L) / 1000L)).toMap
    }
    val got = graft.queries.Similarity.queries("s_graph_rank")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == pr,
      s"diff=${pr.keySet.filter(k => got.get(k) != pr.get(k)).take(5)
        .map(k => s"$k: got ${got.get(k)} want ${pr(k)}")}")
    // the teeth: ranks must actually differentiate (a hub exists) and
    // every node keeps at least the base mass
    assert(got.values.min >= 150000L)
    assert(got.values.toSet.size > 1, "ranks must differentiate nodes")
    graft.CacheBook.releaseAll(spark)
  }
}
