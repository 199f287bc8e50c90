package graft

/** TriangleCount teeth on graphs with known-by-hand answers — the gate
  * corpus exercises only whatever triangles the KNN graph happens to
  * contain, so the operator's edge-canonicalization rules (direction,
  * duplicates, self-loops) are pinned here.
  */
class TriangleCountSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.TriangleCount

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TriangleCount.perNode(TriangleCount.canonical(
        edges.toDF("src", "nbr")))
      .as[(Long, Long)].collect().toMap

  test("path graph has no triangles") {
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == Map.empty)
  }

  test("K4: every node sits in C(3,2)=3 triangles") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(count(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("direction, duplicate edges, and self-loops do not inflate") {
    // one triangle 1-2-3 stated with mixed directions, a duplicate,
    // and a self-loop; pendant node 4 attaches but closes nothing
    val messy = Seq((1L, 2L), (2L, 1L), (3L, 2L), (1L, 3L),
      (2L, 2L), (3L, 4L))
    assert(count(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge count the shared nodes twice") {
    // 1-2-3 and 2-3-4 share edge 2-3
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count(g) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }
}
