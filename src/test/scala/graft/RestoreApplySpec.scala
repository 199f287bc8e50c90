package graft

import java.nio.file.Files
import java.sql.DriverManager

import graft.operators.{SliceRoot, Slicer}
import graft.plans.{Reference, SchemaGraph, TableDef}
import graft.sources.SliceWriter
import graft.tools.RestoreExecutor

/** The parallel restore executor against a LIVE embedded JDBC target
  * (Derby, in the Spark distribution — no external service): a
  * sliced+scrubbed dump with an FK CYCLE restores under jobs=2 with
  * real foreign-key constraints enforcing the parents-before-children
  * contract — a child loaded before its parent would violate the FK
  * and fail the load, so the green run IS the ordering proof, on top
  * of the explicit interval assertion. Cycle members load with their
  * back-edge constraint absent and gain it AFTER the data (Derby has
  * no deferrable constraints — the reference defers, this spec
  * installs late; both are "constraint checked after both sides
  * exist"). Sequences restore last from the manifest. Row counts ==
  * manifest — the reference's restore accounting. */
class RestoreApplySpec extends SparkSpec {
  import spark.implicits._

  private val graph = SchemaGraph(
    tables = Seq(TableDef("p", Seq("pid")), TableDef("c", Seq("cid")),
      TableDef("x", Seq("xid")), TableDef("y", Seq("yid"))),
    references = Seq(
      Reference("cp", "c", Seq("pid"), "p", Seq("pid")),
      // a genuine two-table FK cycle
      Reference("xy", "x", Seq("yid"), "y", Seq("yid")),
      Reference("yx", "y", Seq("xid"), "x", Seq("xid"), deferrable = true)))

  // lazy VAL, not def: forcing it creates the shared session before
  // Slicer.discover consults SparkSession.active
  private lazy val tables = Map(
    "p" -> Seq((1, "secret-a"), (2, "secret-b")).toDF("pid", "txt"),
    "c" -> Seq((10, 1), (11, 1), (12, 2)).toDF("cid", "pid"),
    "x" -> Seq((100, 200), (101, 201)).toDF("xid", "yid"),
    "y" -> Seq((200, 100), (201, 101)).toDF("yid", "xid"))

  private def writeSlice(): String = {
    val ts = tables
    val result = new Slicer(graph, ts(_))
      .run(Seq(SliceRoot("p", "pid IN (1, 2)"), SliceRoot("x", "xid >= 100")))
    val dir = Files.createTempDirectory("restore-apply").toString
    // scrub while dumping (the reference scrubs during COPY-out): the
    // target must receive the SCRUBBED values
    SliceWriter.write(result, dir, scrub = (t, df) =>
      if (t == "p") df.withColumn("txt", org.apache.spark.sql.functions.lit("[scrubbed]"))
      else df)
    dir
  }

  test("dependency-parallel JDBC restore: FK-enforced order, cycle deferred, " +
      "counts == manifest, sequences last") {
    val db = s"memory:restoreApply${System.nanoTime()}"
    val url = s"jdbc:derby:$db;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    // real constraints on the acyclic part: order violations would FAIL
    st.execute("CREATE TABLE p (pid INT PRIMARY KEY, txt VARCHAR(64))")
    st.execute("CREATE TABLE c (cid INT PRIMARY KEY, pid INT REFERENCES p (pid))")
    // the cycle pair: back-edge constraints installed AFTER the load
    st.execute("CREATE TABLE x (xid INT PRIMARY KEY, yid INT)")
    st.execute("CREATE TABLE y (yid INT PRIMARY KEY, xid INT)")
    st.execute("CREATE SEQUENCE p_seq START WITH 1")

    val dir = writeSlice()
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val seqs = collection.mutable.ArrayBuffer.empty[(String, Long)]
    val loads = RestoreExecutor(spark, graph, dir, url, props, jobs = 2,
      setSequence = (t, v) => { seqs += ((t, v)); () })

    // every table loaded exactly once; intervals respect the wait graph
    assert(loads.map(_.table).sorted == Seq("c", "p", "x", "y"))
    val byTable = loads.map(l => l.table -> l).toMap
    assert(byTable("p").endNanos <= byTable("c").startNanos,
      "child c must not start before parent p finished")

    // row counts == manifest (the reference's restore accounting)
    RestoreExecutor.readManifest(dir).foreach { case (t, n, _) =>
      val rs = st.executeQuery(s"SELECT COUNT(*) FROM $t")
      rs.next()
      assert(rs.getLong(1) == n, s"$t: target=${rs.getLong(1)} manifest=$n")
    }

    // the target received SCRUBBED values, never the originals
    val rs = st.executeQuery("SELECT txt FROM p")
    while (rs.next()) assert(rs.getString(1) == "[scrubbed]")

    // the deferred-cycle analog: both back-edge constraints now hold
    // (data was FK-closed, so late installation must succeed)
    st.execute("ALTER TABLE x ADD CONSTRAINT fk_xy FOREIGN KEY (yid) REFERENCES y (yid)")
    st.execute("ALTER TABLE y ADD CONSTRAINT fk_yx FOREIGN KEY (xid) REFERENCES x (xid)")

    // sequences restored last, from the manifest's last_value
    assert(seqs.nonEmpty && seqs.forall(_._2 > 0))

    st.close(); conn.close()
  }

  test("--include-schema restores into an EMPTY target: pre-data creates, " +
      "post-data constrains after the loads") {
    val db = s"memory:restoreEmpty${System.nanoTime()}"
    val url = s"jdbc:derby:$db;create=true"
    val dir = writeSlice()
    // the schema sections the reference embeds (pg_dump --section):
    // derived here from the DataFrame schemas + the FK graph
    graft.sources.DdlWriter.write(graph, t => tables(t).schema,
      Set("p", "c", "x", "y"), dir)
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    // Derby dialect: no `text` type, no DEFERRABLE clause — the hook
    // is exactly where a production caller maps DdlWriter's PostgreSQL
    // output onto the target
    val derby = (s: String) => s
      .replace(" text", " VARCHAR(128)")
      .replace(" DEFERRABLE INITIALLY IMMEDIATE", "")
    val loads = RestoreExecutor(spark, graph, dir, url, props, jobs = 2,
      includeSchema = true, ddlDialect = derby)
    assert(loads.map(_.table).sorted == Seq("c", "p", "x", "y"))
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    // counts == manifest in tables THIS restore created
    RestoreExecutor.readManifest(dir).foreach { case (t, n, _) =>
      val rs = st.executeQuery(s"SELECT COUNT(*) FROM $t")
      rs.next()
      assert(rs.getLong(1) == n, s"$t: target=${rs.getLong(1)} manifest=$n")
    }
    // post-data installed the constraints: an orphan child INSERT must
    // now violate the FK (proves the constraint exists and is checked)
    intercept[java.sql.SQLException] {
      st.execute("INSERT INTO c VALUES (99, 42)")
    }
    // the cycle's back-edges exist too (installed after the data)
    intercept[java.sql.SQLException] {
      st.execute("INSERT INTO x VALUES (999, 12345)")
    }
    st.close(); conn.close()
  }

  test("a failed table load fails the restore (no silent partial success)") {
    val db = s"memory:restoreFail${System.nanoTime()}"
    val url = s"jdbc:derby:$db;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute("CREATE TABLE p (pid INT PRIMARY KEY)")
    conn.close()
    val dir = writeSlice()
    // target table c is MISSING a column the dump carries -> the load
    // errors; apply must rethrow, not report success
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    intercept[Throwable] {
      RestoreExecutor(spark, graph, dir, url, props, jobs = 2)
    }
    ()
  }
}
