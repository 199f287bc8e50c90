package graft

import org.apache.spark.sql.DataFrame

import graft.operators.FkAudit
import graft.plans.{Reference, SchemaGraph, TableDef}

/** The synthetic corpus has zero orphans, so the gate only proves the
  * audit's COUNTS; this spec proves it actually catches corruption —
  * a hand graph with dangling FKs, NULL FKs, a composite key, and a
  * non-unique parent key must each report exactly right.
  */
class FkAuditSpec extends SparkSpec {

  test("the audit catches orphans, tolerates NULLs, handles composite keys") {
    import spark.implicits._
    val g = SchemaGraph(
      tables = Seq(TableDef("p", Seq("pk")), TableDef("c", Seq("id")),
        TableDef("e", Seq("a", "b"), unique = false),
        TableDef("f", Seq("id2"))),
      references = Seq(
        Reference("c_p", "c", Seq("fk"), "p", Seq("pk")),
        Reference("f_e", "f", Seq("fa", "fb"), "e", Seq("a", "b"))))
    val frames: Map[String, DataFrame] = Map(
      "p" -> Seq(1L, 2L, 3L).toDF("pk"),
      // id 13 dangles (fk=9), id 14 has a legal NULL fk
      "c" -> Seq((10L, Some(1L)), (11L, Some(2L)), (12L, Some(3L)),
        (13L, Some(9L)), (14L, None)).toDF("id", "fk"),
      // non-unique parent key: (1,1) appears twice — still ONE key
      "e" -> Seq((1L, 1L), (1L, 1L), (2L, 2L)).toDF("a", "b"),
      // (2,2) matches; (1,2) is a composite orphan (each half exists,
      // the PAIR does not); one half-NULL row counts as NULL-FK
      "f" -> Seq((20L, Some(2L), Some(2L)), (21L, Some(1L), Some(2L)),
        (22L, None, Some(1L))).toDF("id2", "fa", "fb"))
    val out = FkAudit.run(g, frames(_)).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("c_p") == ((5L, 1L, 1L)), s"c_p got ${out("c_p")}")
    assert(out("f_e") == ((3L, 1L, 1L)), s"f_e got ${out("f_e")}")
  }

  test("an empty child table reports zeros, never NULLs") {
    import spark.implicits._
    val g = SchemaGraph(
      tables = Seq(TableDef("p", Seq("pk")), TableDef("c", Seq("id"))),
      references = Seq(Reference("c_p", "c", Seq("fk"), "p", Seq("pk"))))
    val frames: Map[String, DataFrame] = Map(
      "p" -> Seq(1L).toDF("pk"),
      "c" -> Seq.empty[(Long, Option[Long])].toDF("id", "fk"))
    val r = FkAudit.run(g, frames(_)).collect().head
    assert(!(3 to 5).exists(r.isNullAt), s"NULL count in ${r.mkString(",")}")
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((0L, 0L, 0L)))
  }

  test("an FK-free graph yields an empty frame and valid oracle SQL") {
    val g = SchemaGraph(tables = Seq(TableDef("solo", Seq("id"))),
      references = Seq.empty)
    val out = FkAudit.run(g, t => fail(s"loader called for $t"))
    assert(out.columns.toSeq == Seq("ref_id", "child_table", "parent_table",
      "n_child", "n_null_fk", "n_orphans"))
    assert(out.count() == 0L)
    assert(FkAudit.oracleSql(g).trim.startsWith("SELECT"))
  }

  test("the real schema audits clean at sf0.001") {
    val rows = FkAudit.run(SchemaGraph.tpch,
        t => Tables.load(spark, "/root/testdata/sf0.001", t)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(5) == 0L, s"orphans under ${r.getString(0)}")
      assert(r.getLong(3) > 0L, s"empty child under ${r.getString(0)}")
    }
  }
}
