package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.plans.{Reference, SchemaGraph, TableDef}

/** Live FK-graph introspection — the analog of the reference's
  * pg_catalog schema query (slice_db/schema.py:6-98), which is the first
  * thing a real user runs: point the tool at a database and get the
  * graph that drives slicing, instead of hand-writing SchemaConfig JSON.
  *
  * The reference issues one JSON-aggregating SQL statement over
  * pg_constraint/pg_class/pg_attribute; graft issues two flat relational
  * queries (one row per key column, one per FK column pair) through the
  * Spark JDBC source and assembles the [[SchemaGraph]] on the driver —
  * catalog metadata is tiny (a row per constraint column), so collecting
  * it is the same driver-sized operation as the reference's fetchval.
  *
  * The SQL is unit-tested against recorded pg_catalog result fixtures
  * (no live PostgreSQL in this container); `viaJdbc` wires the exact
  * same frames from a real connection.
  */
object SchemaIntrospect {

  /** One row per PRIMARY KEY / UNIQUE constraint column.
    * Columns: table_id, con_name, column_name, ord, is_primary. */
  val keySql: String =
    """SELECT pn.nspname || '.' || rel.relname AS table_id,
      |       con.conname AS con_name,
      |       att.attname AS column_name,
      |       k.ordinality AS ord,
      |       (con.contype = 'p') AS is_primary
      |FROM pg_constraint con
      |JOIN pg_class rel ON con.conrelid = rel.oid
      |JOIN pg_namespace pn ON rel.relnamespace = pn.oid
      |CROSS JOIN LATERAL unnest(con.conkey)
      |  WITH ORDINALITY AS k(attnum, ordinality)
      |JOIN pg_attribute att
      |  ON att.attrelid = con.conrelid AND att.attnum = k.attnum
      |WHERE con.contype IN ('p', 'u')
      |  AND pn.nspname <> 'information_schema'
      |  AND pn.nspname NOT LIKE 'pg\_%'""".stripMargin

  /** One row per FOREIGN KEY constraint column pair, ordinality-aligned
    * (unnest over conkey/confkey WITH ORDINALITY, exactly as the
    * reference's lateral join does for multi-column FKs).
    * Columns: ref_id, table_id, column_name, ref_table_id,
    * ref_column_name, ord, deferrable. */
  val foreignKeySql: String =
    """SELECT pn.nspname || '.' || child.relname || '.' || con.conname AS ref_id,
      |       pn.nspname || '.' || child.relname AS table_id,
      |       att.attname AS column_name,
      |       pn2.nspname || '.' || parent.relname AS ref_table_id,
      |       att2.attname AS ref_column_name,
      |       k.ordinality AS ord,
      |       con.condeferrable AS deferrable
      |FROM pg_constraint con
      |JOIN pg_class child ON con.conrelid = child.oid
      |JOIN pg_namespace pn ON child.relnamespace = pn.oid
      |JOIN pg_class parent ON con.confrelid = parent.oid
      |JOIN pg_namespace pn2 ON parent.relnamespace = pn2.oid
      |CROSS JOIN LATERAL unnest(con.conkey, con.confkey)
      |  WITH ORDINALITY AS k(conkey, confkey, ordinality)
      |JOIN pg_attribute att
      |  ON att.attrelid = con.conrelid AND att.attnum = k.conkey
      |JOIN pg_attribute att2
      |  ON att2.attrelid = con.confrelid AND att2.attnum = k.confkey
      |WHERE con.contype = 'f'
      |  AND pn.nspname <> 'information_schema'
      |  AND pn.nspname NOT LIKE 'pg\_%'""".stripMargin

  /** Introspect a live PostgreSQL over JDBC. */
  def viaJdbc(spark: SparkSession, url: String,
      user: String = "", password: String = ""): SchemaGraph = {
    def q(sql: String): DataFrame =
      spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", s"($sql) AS introspect")
        .option("user", user)
        .option("password", password)
        .load()
    fromFrames(q(keySql), q(foreignKeySql))
  }

  /** Assemble a SchemaGraph from the two catalog result sets. A table's
    * key is its PRIMARY KEY when one exists, else its alphabetically
    * first UNIQUE constraint (both are unique — TableDef.unique = true).
    * Tables with neither are omitted: the Slicer needs a row identity
    * (the reference walks ctid row ids there; a lake-side slice has no
    * ctid analog). */
  def fromFrames(keys: DataFrame, fks: DataFrame): SchemaGraph = {
    def str(r: Row, c: String) = r.getAs[String](c)
    def ord(r: Row) = r.getAs[Number]("ord").longValue()

    val keyRows = keys.collect()
    val tables = keyRows.groupBy(str(_, "table_id")).toSeq.sortBy(_._1)
      .map { case (t, rows) =>
        val (_, conCols) = rows.groupBy(str(_, "con_name")).toSeq
          .sortBy { case (con, cols) =>
            (!cols.head.getAs[Boolean]("is_primary"), con)
          }.head
        TableDef(t, conCols.sortBy(ord).map(str(_, "column_name")).toSeq)
      }

    // only references whose BOTH endpoints survived the key filter: a
    // child with an FK but no PK/UNIQUE was dropped above, and a
    // Reference naming a dropped table would crash the Slicer mid-walk
    val known = tables.map(_.id).toSet
    val refs = fks.collect().groupBy(str(_, "ref_id")).toSeq.sortBy(_._1)
      .map { case (id, rows) =>
        val sorted = rows.sortBy(ord)
        Reference(id,
          table = str(sorted.head, "table_id"),
          columns = sorted.map(str(_, "column_name")).toSeq,
          refTable = str(sorted.head, "ref_table_id"),
          refColumns = sorted.map(str(_, "ref_column_name")).toSeq,
          // introspection cannot know INTENT: reverse=true would make
          // every parent pull ALL of its children (a nation root
          // snowballs into the whole database). The reference requires
          // directions to be configured per dump; likewise, introspected
          // graphs start forward-only and the operator opts reverse in
          // per reference (edit the printed JSON, or flip in code).
          reverse = false,
          deferrable = sorted.head.getAs[Boolean]("deferrable"))
      }
      .filter(r => known(r.table) && known(r.refTable))
    SchemaGraph(tables, refs)
  }
}
