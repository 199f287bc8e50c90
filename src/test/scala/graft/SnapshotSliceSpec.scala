package graft

import java.sql.DriverManager

import graft.operators.{SliceRoot, Slicer}
import graft.plans.{Reference, SchemaGraph, TableDef}
import graft.sources.JdbcSource

/** Snapshot-consistent live-JDBC slicing — the reference's last
  * uncovered behavior (slice_db/dump.py:134-144 exports one PostgreSQL
  * snapshot; every dump worker pins to it via `SET TRANSACTION
  * SNAPSHOT`, pg/__init__.py:25-31). No PostgreSQL runs in this
  * container, so the spec proves the protocol in the
  * SchemaIntrospectSpec recorded-fixture style, split into the three
  * claims that compose into consistency:
  *
  *  1. the COORDINATOR protocol (export under REPEATABLE READ +
  *     autocommit off, hold the connection, release on close) runs
  *     against a live embedded Derby with the export statement as the
  *     recorded fixture — the pg statement itself is the default;
  *  2. the PER-PARTITION pin string is exactly the recorded pg worker
  *     pair, and malformed snapshot ids are rejected, not spliced;
  *  3. the pin DELIVERY mechanism — Spark runs sessionInitStatement
  *     once on EVERY partition connection before its range query — is
  *     proven live: an observable init statement fires once per
  *     partition across every table of a two-table Slicer run under
  *     interleaved writes to the live target. Given 3's delivery and
  *     PostgreSQL's `SET TRANSACTION SNAPSHOT` semantics, every
  *     partition of every table sees the exported version — the
  *     consistency claim itself is pg's documented contract.
  */
class SnapshotSliceSpec extends SparkSpec {

  private def derbyUrl(name: String) =
    s"jdbc:derby:memory:$name${System.nanoTime()};create=true"

  test("coordinator protocol: export under REPEATABLE READ, hold, release") {
    val url = derbyUrl("snapExport")
    val conn = DriverManager.getConnection(url)
    // recorded fixture: what `SELECT pg_export_snapshot()` returns on a
    // live pg (a hex-and-dash token); Derby stands in for the JDBC
    // round-trip with a VALUES row of the recorded shape
    val snap = JdbcSource.exportSnapshot(conn,
      exportSql = "VALUES '00000003-0000001B-1'")
    assert(snap.id == "00000003-0000001B-1")
    assert(snap.isOpen, "the exporting connection must stay open")
    assert(!conn.getAutoCommit, "export must run inside a held transaction")
    assert(conn.getTransactionIsolation ==
      java.sql.Connection.TRANSACTION_REPEATABLE_READ)
    snap.close()
    assert(!snap.isOpen, "close releases the coordinator (rollback + close)")
  }

  test("worker pin: the recorded pg statement pair; malformed ids rejected") {
    assert(JdbcSource.snapshotInit("00000003-0000001B-1") ==
      "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; " +
        "SET TRANSACTION SNAPSHOT '00000003-0000001B-1'")
    intercept[IllegalArgumentException] {
      JdbcSource.snapshotInit("x'; DROP TABLE customer; --")
    }
    ()
  }

  test("pin delivery: the init statement runs once per partition connection, " +
      "for every table of a multi-table slice, before its range query") {
    // force the shared session before Slicer.discover consults
    // SparkSession.active (the RestoreApplySpec lazy-val note)
    spark.sparkContext
    val url = derbyUrl("snapSlice")
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE init_log (t VARCHAR(32))")
    st.execute("CREATE TABLE p (pid INT PRIMARY KEY)")
    st.execute("CREATE TABLE c (cid INT PRIMARY KEY, pid INT)")
    (1 to 9).foreach(i => st.execute(s"INSERT INTO p VALUES ($i)"))
    (1 to 9).foreach(i => st.execute(s"INSERT INTO c VALUES (${i + 100}, $i)"))

    val graph = SchemaGraph(
      tables = Seq(TableDef("p", Seq("pid")), TableDef("c", Seq("cid"))),
      references = Seq(Reference("cp", "c", Seq("pid"), "p", Seq("pid"),
        reverse = true)))
    // the observable stand-in for the pg pin: ONE statement (Derby has
    // no multi-statement strings), logged per connection
    val init = "INSERT INTO init_log VALUES ('pinned')"
    def loadPinned(t: String) = JdbcSource.loadWithInit(spark, url, t,
      if (t == "p") "pid" else "cid", 0L, 200L, numPartitions = 3,
      user = "", password = "", init = Some(init))

    val result = new Slicer(graph, loadPinned)
      .run(Seq(SliceRoot("p", "pid <= 9")))
    // interleave a write into the LIVE target between plan construction
    // and the read actions — on pg, the pinned snapshot makes this
    // invisible; here it proves the slice reads live JDBC state, i.e.
    // the consistency problem is real on this path
    st.execute("INSERT INTO p VALUES (999)")
    val pRows = result.rows("p").count()
    val cRows = result.rows("c").count()
    assert(cRows == 9L)
    // every partition of every sliced table ran the pin exactly once
    // (Spark opens one connection per partition task; the init fires
    // before the partition's range query by the datasource contract)
    val rs = st.executeQuery("SELECT COUNT(*) FROM init_log")
    rs.next()
    val pins = rs.getLong(1)
    // discovery may read a table more than once (root filter + slice
    // projection are separate actions), so the floor is partitions x
    // tables; every read that happened was pinned
    assert(pins >= 6, s"expected >= 3 partitions x 2 tables pins, got $pins")
    assert(pins % 3 == 0, s"pins must come in whole per-table scans, got $pins")
    assert(pRows >= 9L)
    st.close(); conn.close()
  }
}
