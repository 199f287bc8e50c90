package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to its minimum id") {
    // 1-2-3-4-5: worst case for propagation (diameter rounds)
    val m = labelsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components keep separate labels; cycles terminate") {
    val m = labelsOf(Seq(
      (10L, 11L), (11L, 12L), (12L, 10L), // triangle (cycle)
      (20L, 21L),                         // pair
      (30L, 31L), (32L, 31L)))            // star centered off-min
    assert(m(10L) == 10L && m(11L) == 10L && m(12L) == 10L)
    assert(m(20L) == 20L && m(21L) == 20L)
    assert(m(30L) == 30L && m(31L) == 30L && m(32L) == 30L)
  }

  test("edge direction does not matter") {
    assert(labelsOf(Seq((5L, 1L), (1L, 3L))) == Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }
}
