package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC ingest — how graft's operators would read a live PostgreSQL the
  * way the reference does (the reference pages rows over asyncpg;
  * Spark's JDBC source instead issues `numPartitions` range-partitioned
  * queries so the scan parallelizes across executors).
  *
  * `new Slicer(graph, t => JdbcSource.load(spark, url, t, keyOf(t), ...))`
  * slices a live database; everything downstream is unchanged because
  * operators only see DataFrames. NOT exercised in this container (no
  * database available; zero egress) — the test corpus drives the same
  * code paths through parquet instead.
  */
object JdbcSource {
  def load(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int = 32,
      user: String = "",
      password: String = ""): DataFrame =
    loadWithInit(spark, url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, user, password, init = None)

  /** A held exported snapshot: the coordinator connection that exported
    * it must stay OPEN until every partition read has finished —
    * PostgreSQL releases an exported snapshot when the exporting
    * transaction ends (slice_db holds its coordinator connection the
    * same way, pg/__init__.py:25-31). Closing rolls the coordinator
    * back and releases the snapshot. */
  final class ExportedSnapshot private[sources] (
      conn: java.sql.Connection, val id: String) extends AutoCloseable {
    def isOpen: Boolean = !conn.isClosed
    override def close(): Unit = { try conn.rollback() finally conn.close() }
  }

  /** Export a snapshot from a coordinator connection the caller opens
    * (and this object then OWNS via the returned handle): REPEATABLE
    * READ, autocommit off, `SELECT pg_export_snapshot()` — the
    * reference's consistency anchor (slice_db/dump.py:134-144). The
    * statement is a parameter only so the protocol is testable against
    * an embedded database that lacks pg_export_snapshot; production
    * callers use the default. */
  def exportSnapshot(conn: java.sql.Connection,
      exportSql: String = "SELECT pg_export_snapshot()"): ExportedSnapshot = {
    conn.setAutoCommit(false)
    conn.setTransactionIsolation(java.sql.Connection.TRANSACTION_REPEATABLE_READ)
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(exportSql)
      require(rs.next(), s"snapshot export returned no row: $exportSql")
      new ExportedSnapshot(conn, rs.getString(1))
    } finally st.close()
  }

  /** The per-partition pin every worker connection runs BEFORE its
    * range query (Spark's `sessionInitStatement` hook): the same
    * REPEATABLE READ + `SET TRANSACTION SNAPSHOT` pair the reference
    * issues per dump worker (`SET TRANSACTION SNAPSHOT`,
    * slice_db/pg/__init__.py:25-31). PostgreSQL snapshot ids are
    * hex-and-dash tokens; anything else is rejected rather than
    * spliced into SQL. */
  def snapshotInit(snapshotId: String): String = {
    require(snapshotId.matches("[0-9A-Fa-f-]+"),
      s"malformed snapshot id: '$snapshotId'")
    "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; " +
      s"SET TRANSACTION SNAPSHOT '$snapshotId'"
  }

  /** SNAPSHOT-CONSISTENT partitioned read of a LIVE table: all
    * `numPartitions` range queries — and every table of a multi-table
    * slice that passes the same snapshot — see ONE point-in-time
    * version of the database, however long the scan runs and whatever
    * commits concurrently. Without the pin, partitioned JDBC scans of
    * a live OLTP source can tear (table A read at t0, table B at t1).
    *
    *   val snap = JdbcSource.exportSnapshot(coordinatorConn)
    *   try new Slicer(graph, t =>
    *     JdbcSource.loadSnapshot(spark, url, t, keyOf(t), lo(t), hi(t),
    *       snap.id)).run(roots)
    *   finally snap.close() // AFTER every read action has run
    *
    * PostgreSQL-only: the pin statement is pg dialect (other engines
    * have no exported-snapshot analog over plain JDBC; MySQL's
    * `START TRANSACTION WITH CONSISTENT SNAPSHOT` has no cross-
    * connection export, so multi-connection consistency is not
    * expressible there). */
  def loadSnapshot(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      snapshotId: String,
      numPartitions: Int = 32,
      user: String = "",
      password: String = ""): DataFrame =
    loadWithInit(spark, url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, user, password, init = Some(snapshotInit(snapshotId)))

  /** Shared reader: `init` runs on EVERY partition's connection before
    * its range query (Spark executes sessionInitStatement once per
    * opened connection) — the hook the snapshot pin rides on;
    * package-visible so the spec can prove the per-connection
    * execution with an observable statement on the embedded target. */
  private[graft] def loadWithInit(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      user: String,
      password: String,
      init: Option[String]): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("user", user)
      .option("password", password)
      .option("fetchsize", 10000)
    init.foreach(r.option("sessionInitStatement", _))
    r.load()
  }

  /** Write a slice back over JDBC (restore path for live databases);
    * per-table ordering/deferral comes from RestoreWriter's plan. */
  def write(df: DataFrame, url: String, table: String,
      user: String = "", password: String = ""): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", 10000)
      .mode("append")
      .save()
}
