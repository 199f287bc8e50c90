package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{SliceRoot, Slicer}
import graft.plans.{Reference, SchemaGraph, TableDef}

class SlicerSpec extends SparkSpec {
  import spark.implicits._

  // parent <- child; grandchild references child
  private val graph = SchemaGraph(
    tables = Seq(
      TableDef("parent", Seq("pid")),
      TableDef("child", Seq("cid")),
      TableDef("grandchild", Seq("gid"))),
    references = Seq(
      Reference("c_p", "child", Seq("pid"), "parent", Seq("pid")),
      Reference("g_c", "grandchild", Seq("cid"), "child", Seq("cid"))))

  private val tables: Map[String, DataFrame] = Map(
    "parent" -> Seq((1, "a"), (2, "b"), (3, "c")).toDF("pid", "name"),
    "child" -> Seq((10, 1), (11, 1), (12, 2)).toDF("cid", "pid"),
    "grandchild" -> Seq((100, 10), (101, 12)).toDF("gid", "cid"))

  private def slicer(g: SchemaGraph = graph) = new Slicer(g, tables(_))

  test("forward slice pulls parents only") {
    val fwd = graph.copy(references = graph.references.map(_.copy(reverse = false)))
    val r = new Slicer(fwd, tables(_)).run(Seq(SliceRoot("child", "cid = 10")))
    assert(r.rows("parent").as[(Int, String)].collect().toSet == Set((1, "a")))
    assert(r.keys.get("grandchild").isEmpty)
  }

  test("reverse slice pulls children transitively to fixpoint") {
    val r = slicer().run(Seq(SliceRoot("parent", "pid = 1")))
    assert(r.rows("child").select("cid").as[Int].collect().toSet == Set(10, 11))
    assert(r.rows("grandchild").select("gid").as[Int].collect().toSet == Set(100))
  }

  test("multi-root discovery unions and dedups") {
    val r = slicer().run(Seq(
      SliceRoot("parent", "pid = 1"), SliceRoot("parent", "pid = 2")))
    assert(r.rows("child").select("cid").as[Int].collect().toSet == Set(10, 11, 12))
    assert(r.rows("grandchild").select("gid").as[Int].collect().toSet == Set(100, 101))
  }

  test("extend reaches exactly what a from-scratch union slice reaches") {
    val s = slicer()
    val incremental = s.extend(
      s.run(Seq(SliceRoot("parent", "pid = 1"))),
      Seq(SliceRoot("parent", "pid = 2")))
    val scratch = s.run(Seq(
      SliceRoot("parent", "pid = 1"), SliceRoot("parent", "pid = 2")))
    Seq("parent", "child", "grandchild").foreach { t =>
      assert(incremental.rows(t).collect().toSet == scratch.rows(t).collect().toSet, t)
      assert(incremental.keyCounts(t) == scratch.keyCounts(t), s"$t counts")
    }
    // seeds fully covered by the prior slice are a no-op extension
    val noop = s.extend(scratch, Seq(SliceRoot("parent", "pid = 1")))
    assert(noop.keyCounts == scratch.keyCounts)
  }

  test("deep chain BFS crosses the generation-compaction threshold") {
    // 12-table chain: t0 references t1 references ... t11 (forward
    // refs), so a root at t0 walks 11 rounds — past compactEvery=8
    val n = 12
    val chainGraph = SchemaGraph(
      tables = (0 until n).map(i => TableDef(s"t$i", Seq("id"))),
      references = (0 until n - 1).map(i =>
        Reference(s"r$i", s"t$i", Seq("nxt"), s"t${i + 1}", Seq("id"), reverse = false)))
    val chainTables: Map[String, DataFrame] = (0 until n).map { i =>
      s"t$i" -> Seq((i, i + 1)).toDF("id", "nxt")
    }.toMap
    val r = new Slicer(chainGraph, chainTables(_)).run(Seq(SliceRoot("t0", "id = 0")))
    assert(r.keys.keySet == (0 until n).map(i => s"t$i").toSet)
    (0 until n).foreach { i =>
      assert(r.rows(s"t$i").select("id").as[Int].collect().toSeq == Seq(i), s"t$i")
    }
  }

  test("manifest counts rows per reached table") {
    val m = slicer().run(Seq(SliceRoot("parent", "pid = 2"))).manifest
      .as[(String, Long)].collect().toMap
    assert(m == Map("parent" -> 1L, "child" -> 1L, "grandchild" -> 1L))
  }

  test("self-referencing FK (employee -> manager) walks chains and survives cycles") {
    // the reference's pg schemas routinely self-reference; the walk must
    // chain through the same table across rounds, drop NULL FK values,
    // and terminate on a 2-cycle via the anti-join
    val g = SchemaGraph(
      tables = Seq(TableDef("emp", Seq("id"))),
      references = Seq(
        Reference("mgr", "emp", Seq("mgr_id"), "emp", Seq("id"), reverse = false)))
    val emp = Seq(
      (1, Option.empty[Int]), (2, Some(1)), (3, Some(2)), // chain 3 -> 2 -> 1
      (4, Some(5)), (5, Some(4)),                         // 2-cycle 4 <-> 5
      (6, Option.empty[Int]))
      .toDF("id", "mgr_id")
    val s = new Slicer(g, Map("emp" -> emp)(_))
    val chain = s.run(Seq(SliceRoot("emp", "id = 3")))
    assert(chain.rows("emp").select("id").as[Int].collect().toSet == Set(1, 2, 3))
    assert(chain.keyCounts("emp") == 3L)
    val cyc = s.run(Seq(SliceRoot("emp", "id = 4")))
    assert(cyc.rows("emp").select("id").as[Int].collect().toSet == Set(4, 5))
  }

  test("SPARK_GRAFT_SLICE_TRUST_FK=false validates forward FKs against the scan") {
    // dangling FK: child row points at parent 99, which does not exist.
    // Trust mode (default, enforced-FK sources) takes the FK value as a
    // discovered key — manifest over-reports; validate mode scans and
    // drops the phantom.
    val fwd = graph.copy(references = graph.references.map(_.copy(reverse = false)))
    val broken = tables + ("child" ->
      Seq((10, 1), (11, 99)).toDF("cid", "pid"))
    def keysOf(): Set[Int] =
      new Slicer(fwd, broken(_)).run(Seq(SliceRoot("child", "cid >= 0")))
        .keys("parent").select("pid").as[Int].collect().toSet
    assert(keysOf() == Set(1, 99), "trust mode reports the phantom key")
    System.setProperty("graft.slice.distrustForwardKeys", "true")
    try assert(keysOf() == Set(1), "validate mode drops the phantom key")
    finally System.clearProperty("graft.slice.distrustForwardKeys")
  }

  test("reverse refs onto a PK-keyed child NEVER take the no-scan shortcut") {
    // 1:1 optional extension table keyed by the parent's key: integrity
    // guarantees child FK -> parent, NOT that every parent row has an
    // extension row. Reverse discovery must scan the child — the no-scan
    // shortcut here would invent phantom keys for parents 2 and 3.
    val g = SchemaGraph(
      tables = Seq(TableDef("p", Seq("pid")), TableDef("ext", Seq("pid"))),
      references = Seq(
        Reference("ep", "ext", Seq("pid"), "p", Seq("pid")))) // forward+reverse
    val tbls: Map[String, DataFrame] = Map(
      "p" -> Seq((1, "a"), (2, "b"), (3, "c")).toDF("pid", "name"),
      "ext" -> Seq((1, "only-parent-1-has-an-extension")).toDF("pid", "extra"))
    val r = new Slicer(g, tbls(_)).run(Seq(SliceRoot("p", "pid >= 1")))
    assert(r.keyCounts("ext") == 1L, "phantom extension keys invented")
    assert(r.rows("ext").count() == 1L)
    assert(r.manifest.as[(String, Long)].collect().toMap == Map("p" -> 3L, "ext" -> 1L))
  }

  test("two FKs between the same tables expand through both") {
    // orders-style billing/shipping double reference: one frontier row
    // must pull BOTH referenced parents (candidates union per round)
    val g = SchemaGraph(
      tables = Seq(TableDef("addr", Seq("aid")), TableDef("ord", Seq("oid"))),
      references = Seq(
        Reference("bill", "ord", Seq("bill_aid"), "addr", Seq("aid"), reverse = false),
        Reference("ship", "ord", Seq("ship_aid"), "addr", Seq("aid"), reverse = false)))
    val tbls: Map[String, DataFrame] = Map(
      "addr" -> Seq((1, "x"), (2, "y"), (3, "z")).toDF("aid", "loc"),
      "ord" -> Seq((10, 1, 2), (11, 3, 3)).toDF("oid", "bill_aid", "ship_aid"))
    val r = new Slicer(g, tbls(_)).run(Seq(SliceRoot("ord", "oid = 10")))
    assert(r.rows("addr").select("aid").as[Int].collect().toSet == Set(1, 2))
    assert(r.keyCounts("addr") == 2L)
  }

  test("discovery equals a naive driver-side fixpoint on random FK-consistent data") {
    // randomized equivalence: the distributed BFS (aug frontiers,
    // pre-anti-joins, no-scan PK candidates, fused count+max) must
    // reach exactly the closure a trivial in-memory fixpoint computes,
    // with matching counts and maxes, on arbitrary FK-consistent data
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val nP = 2 + rnd.nextInt(4)
      val nC = 3 + rnd.nextInt(6)
      val nG = 3 + rnd.nextInt(8)
      val parents = (1 to nP).map(i => (i, s"p$i"))
      val children = (1 to nC).map(i => (10 + i, 1 + rnd.nextInt(nP)))
      val grand = (1 to nG).map(i => (100 + i, 11 + rnd.nextInt(nC)))
      val tbls: Map[String, DataFrame] = Map(
        "parent" -> parents.toDF("pid", "name"),
        "child" -> children.toDF("cid", "pid"),
        "grandchild" -> grand.toDF("gid", "cid"))
      val rootMax = 1 + rnd.nextInt(nP)
      val r = new Slicer(graph, tbls(_))
        .run(Seq(SliceRoot("parent", s"pid <= $rootMax")))

      var keep = Map(
        "parent" -> parents.map(_._1).filter(_ <= rootMax).toSet,
        "child" -> Set.empty[Int], "grandchild" -> Set.empty[Int])
      var changed = true
      while (changed) {
        val next = Map(
          "parent" -> (keep("parent") ++
            children.filter(c => keep("child")(c._1)).map(_._2)),
          "child" -> (children.filter(c => keep("parent")(c._2)).map(_._1).toSet ++
            grand.filter(g => keep("grandchild")(g._1)).map(_._2)),
          "grandchild" -> grand.filter(g => keep("child")(g._2)).map(_._1).toSet)
        changed = next != keep
        keep = next
      }

      for ((t, keyCol) <- Seq("parent" -> "pid", "child" -> "cid", "grandchild" -> "gid")) {
        val got = r.keys.get(t)
          .map(_.select(keyCol).as[Int].collect().toSet).getOrElse(Set.empty[Int])
        assert(got == keep(t), s"trial $trial: $t keys")
        assert(r.keyCounts.getOrElse(t, 0L) == keep(t).size.toLong, s"trial $trial: $t count")
        if (keep(t).nonEmpty)
          assert(r.keyMaxes(t) == keep(t).max.toLong, s"trial $trial: $t max")
      }
    }
  }

  test("manifest counts rows, not key tuples, for non-unique keys") {
    // ev's declared key (eid) is NOT unique: two rows share eid=7. The
    // manifest must report materialized rows (3), not discovered key
    // tuples (2) — the synthetic lineitem table has the same shape.
    val g = SchemaGraph(
      tables = Seq(TableDef("p", Seq("pid")),
        TableDef("ev", Seq("eid"), unique = false)),
      references = Seq(Reference("e_p", "ev", Seq("pid"), "p", Seq("pid"))))
    val tbls: Map[String, DataFrame] = Map(
      "p" -> Seq((1, "a"), (2, "b")).toDF("pid", "name"),
      "ev" -> Seq((7, 1, "x"), (7, 1, "y"), (8, 1, "z"), (9, 2, "w"))
        .toDF("eid", "pid", "v"))
    val m = new Slicer(g, tbls(_)).run(Seq(SliceRoot("p", "pid = 1"))).manifest
      .as[(String, Long)].collect().toMap
    assert(m == Map("p" -> 1L, "ev" -> 3L))
  }

  test("reachability closure honors reference directions") {
    assert(graph.reachableFrom("parent") == Set("parent", "child", "grandchild"))
    val fwd = graph.copy(references = graph.references.map(_.copy(reverse = false)))
    assert(fwd.reachableFrom("parent") == Set("parent"), "no reverse refs: nothing to pull")
    assert(fwd.reachableFrom("grandchild") == Set("grandchild", "child", "parent"))
  }

  test("restore order is parents-first; cycles marked deferred") {
    assert(graph.restoreOrder == Seq(
      ("parent", false), ("child", false), ("grandchild", false)))
    val cyclic = SchemaGraph(
      tables = Seq(TableDef("a", Seq("id")), TableDef("b", Seq("id"))),
      references = Seq(
        Reference("ab", "a", Seq("bid"), "b", Seq("id")),
        Reference("ba", "b", Seq("aid"), "a", Seq("id"))))
    val order = cyclic.restoreOrder
    assert(order.map(_._1).toSet == Set("a", "b"))
    assert(order.head._2, "first cycle member must be deferred")
  }

  test("cycle breaking prefers tables with DEFERRABLE incoming FKs") {
    val cyclic = SchemaGraph(
      tables = Seq(TableDef("a", Seq("id")), TableDef("b", Seq("id"))),
      references = Seq(
        Reference("ab", "a", Seq("bid"), "b", Seq("id")),
        Reference("ba", "b", Seq("aid"), "a", Seq("id"), deferrable = true)))
    // b's incoming FK is deferrable -> break the cycle at b, not min("a")
    assert(cyclic.restoreOrder == Seq(("b", true), ("a", false)))
  }

  test("slice_diff carves consistently: disjoint facts, shared dims") {
    val rows = graft.queries.SliceQueries.queries("slice_diff")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq ==
      Seq("customer", "lineitem", "nation", "orders", "part", "region", "supplier"))
    for ((t, na, nb, nc, oa, ob) <- rows) {
      assert(nc <= math.min(na, nb) && oa == na - nc && ob == nb - nc,
        s"$t: carve arithmetic broken")
    }
    val byT = rows.map(r => r._1 -> r).toMap
    // disjoint customer cohorts share ZERO fact keys...
    for (t <- Seq("customer", "orders", "lineitem"))
      assert(byT(t)._4 == 0, s"$t: disjoint cohorts share keys")
    // ...but the shared dimensions overlap (disjoint cohorts still buy
    // from the same parts/suppliers and live in the same regions)
    for (t <- Seq("nation", "region", "part", "supplier"))
      assert(byT(t)._4 > 0, s"$t: disjoint cohorts share no dimension keys")
  }
}
