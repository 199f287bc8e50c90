package graft

import graft.queries.Similarity
import org.apache.spark.sql.functions._

/** Teeth for the link-prediction / modularity pair beyond the full
  * oracles: s_link_pred's scores equal a naive common-neighbor
  * computation over the collected KNN graph and never propose an
  * existing edge, and s_modularity's per-community terms equal a naive
  * replay from the collected labels + edges with the global Q the sum
  * of its own rows. The graph at sf0.001 is ~500 nodes — small enough
  * to replay exactly in the JVM.
  */
class GraphPredSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** canonical undirected edge set from the public s_knn_graph entry */
  private lazy val und: Set[(Long, Long)] =
    Similarity.queries("s_knn_graph")(spark, dir)
      .select("src", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => t._1 != t._2)
      .map(t => (math.min(t._1, t._2), math.max(t._1, t._2)))
      .toSet

  private lazy val adj: Map[Long, Set[Long]] =
    und.toSeq.flatMap(t => Seq(t._1 -> t._2, t._2 -> t._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("s_link_pred equals naive common-neighbor scoring, no existing edges") {
    val got = Similarity.queries("s_link_pred")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 20)
    // naive: all non-adjacent 2-hop pairs scored, same order, top 20
    // iterate Seqs, not Sets — a Set-typed inner generator would
    // deduplicate the (a,b) wedge multiset before the count
    val cand = for {
      (a, na) <- adj.toSeq
      mid <- na.toSeq
      b <- adj(mid).toSeq if a < b && !und.contains((a, b))
    } yield (a, b)
    val naive = cand.groupBy(identity).map { case ((a, b), g) =>
      val common = g.length.toLong
      val jac = 1000000L * common / (adj(a).size + adj(b).size - common)
      (a, b, common, jac)
    }.toSeq.sortBy(t => (-t._3, -t._4, t._1, t._2)).take(20)
    assert(got.toSeq == naive, "top-20 diverges from the naive scoring")
    assert(got.forall(t => !und.contains((t._1, t._2))),
      "predicted an existing edge")
    assert(got.forall(t => t._3 >= 1 && t._4 > 0))
  }

  test("s_adamic_adar equals naive degree-weighted scoring, no existing edges") {
    val got = Similarity.queries("s_adamic_adar")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 20)
    val cand = for {
      (a, na) <- adj.toSeq
      mid <- na.toSeq
      b <- adj(mid).toSeq if a < b && !und.contains((a, b))
    } yield (a, b, mid)
    val naive = cand.groupBy(t => (t._1, t._2)).map { case ((a, b), g) =>
      val aa = g.map { case (_, _, z) =>
        Similarity.AdamicPpm(math.min(adj(z).size, 64) - 2)
      }.sum
      (a, b, g.length.toLong, aa)
    }.toSeq.sortBy(t => (-t._4, -t._3, t._1, t._2)).take(20)
    assert(got.toSeq == naive, "top-20 diverges from the naive AA scoring")
    assert(got.forall(t => !und.contains((t._1, t._2))))
    // a shared rare neighbor must outscore the same count of hubs:
    // every aa_ppm is at least common·(weight of a deg-64 hub)
    assert(got.forall(t => t._4 >= t._3 * Similarity.AdamicPpm.last))
  }

  test("s_beam_sweep's beam-8 row equals the shipped graph-search recall") {
    val sweep = Similarity.queries("s_beam_sweep")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(sweep.map(_._1).toSeq == Seq(4, 8, 16))
    // the production path (beam = 8) must score exactly what
    // s_graph_search_recall reports, summed over queries
    val hits8 = Similarity.queries("s_graph_search_recall")(spark, dir)
      .collect().map(_.getInt(1).toLong).sum
    assert(sweep.find(_._1 == 8).get._2 == hits8,
      "sweep beam-8 diverges from the shipped recall")
    // a wider beam explores a superset of seeds through the same
    // rounds: hits must not collapse as beam grows
    assert(sweep.sortBy(_._1).map(_._2).sliding(2).forall(p =>
      p.length < 2 || p(1) >= p(0) - 1), "recall collapses as beam widens")
  }

  test("s_modularity equals a naive replay and sums to its own Q") {
    val labels = Similarity.queries("s_label_prop")(spark, dir)
      .select("vec_id", "community").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Similarity.queries("s_modularity")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val m = BigInt(und.size)
    // conservation: community sizes cover every labeled node, degree
    // mass covers every edge endpoint, intra edges never exceed m
    assert(rows.map(_._2).sum == labels.size.toLong, "csize loses nodes")
    assert(rows.map(_._4).sum == 2L * und.size, "degree mass != 2m")
    assert(rows.map(_._3).sum <= und.size.toLong)
    val q = rows.head._6
    assert(rows.forall(_._6 == q), "q_ppm differs across rows")
    assert(rows.map(_._5).sum == q, "Q is not the sum of its communities")
    for ((c, csize, ein, dsum, contrib, _) <- rows) {
      val members = labels.collect { case (v, l) if l == c => v }.toSet
      assert(members.size.toLong == csize)
      val nEin = und.count(t => members(t._1) && members(t._2)).toLong
      val nDsum = und.toSeq.map(t =>
        (if (members(t._1)) 1L else 0L) + (if (members(t._2)) 1L else 0L)).sum
      assert(nEin == ein, s"community $c intra-edge count")
      assert(nDsum == dsum, s"community $c degree mass")
      val naive = (BigInt(1000000) * ein / m
        - BigInt(1000000) * dsum * dsum / (4 * m * m)).toLong
      assert(naive == contrib, s"community $c contribution")
    }
  }
}
