package graft.sources

import org.apache.spark.sql.types._

import graft.plans.SchemaGraph

/** Schema-section sink — the analog of the reference's optional
  * `pg_dump --section pre-data/post-data` archive members
  * (slice_db/dump.py:330-346, written into the slice at dump.py:112,174).
  * The reference shells out to pg_dump; on the lake side the DDL derives
  * from the DataFrame schemas plus the FK graph, so a slice archive is
  * restorable into an EMPTY database: pre-data creates the tables
  * (parents first), post-data adds the PK/FK constraints (FK cycles
  * declared DEFERRABLE, matching RestoreWriter's deferred handling).
  *
  * Driver-side metadata only — schemas, never rows. */
object DdlWriter {

  /** Spark → PostgreSQL column type. Unknown types degrade to text
    * (documented lossy fallback — a restore keeps the data, not the
    * engine-specific type). */
  def pgType(dt: DataType): String = dt match {
    case LongType               => "bigint"
    case IntegerType            => "integer"
    case ShortType              => "smallint"
    case ByteType               => "smallint"
    case DoubleType             => "double precision"
    case FloatType              => "real"
    case StringType             => "text"
    case BooleanType            => "boolean"
    case BinaryType             => "bytea"
    case d: DecimalType         => s"numeric(${d.precision}, ${d.scale})"
    case DateType               => "date"
    // TimestampType has INSTANT (UTC-normalized) semantics -> timestamptz;
    // only TimestampNTZType maps to pg's zoneless 'timestamp' (conflating
    // them would silently discard instant semantics on restore)
    case TimestampType          => "timestamptz"
    case TimestampNTZType       => "timestamp"
    case ArrayType(e, _)        => pgType(e) + "[]"
    case _                      => "text"
  }

  /** CREATE TABLE statements in restore order (parents before children,
    * though pre-data carries no constraints so the order is cosmetic). */
  def preData(graph: SchemaGraph, schemaOf: String => StructType,
      tables: Set[String]): String = {
    val order = graph.restoreOrder.map(_._1).filter(tables)
    order.map { t =>
      val cols = schemaOf(t).fields.map { f =>
        val nn = if (graph.table(t).key.contains(f.name)) " NOT NULL" else ""
        s"  ${f.name} ${pgType(f.dataType)}$nn"
      }
      cols.mkString(s"CREATE TABLE $t (\n", ",\n", "\n);")
    }.mkString("", "\n", "\n")
  }

  /** PK + FK constraints. Only constraints whose BOTH endpoints are in
    * the slice are emitted (a forward-only slice may not carry every
    * parent); FKs on declared-deferrable references (and every member
    * of an FK cycle, which restore must defer) are emitted DEFERRABLE. */
  def postData(graph: SchemaGraph, tables: Set[String]): String = {
    val cyclic = graph.restoreOrder.collect { case (t, true) => t }.toSet
    val pks = graph.tables.filter(t => tables(t.id) && t.unique).map { t =>
      s"ALTER TABLE ${t.id} ADD PRIMARY KEY (${t.key.mkString(", ")});"
    }
    val fks = graph.references
      .filter(r => tables(r.table) && tables(r.refTable))
      .map { r =>
        val defer =
          if (r.deferrable || cyclic(r.table)) " DEFERRABLE INITIALLY IMMEDIATE" else ""
        s"ALTER TABLE ${r.table} ADD CONSTRAINT ${r.id} FOREIGN KEY " +
          s"(${r.columns.mkString(", ")}) REFERENCES ${r.refTable} " +
          s"(${r.refColumns.mkString(", ")})$defer;"
      }
    (pks ++ fks).mkString("", "\n", "\n")
  }

  /** Write both sections under `<outDir>/schema/` (the archive location
    * the reference uses for its schema members). */
  def write(graph: SchemaGraph, schemaOf: String => StructType,
      tables: Set[String], outDir: String): Unit = {
    val dir = java.nio.file.Paths.get(outDir, "schema")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("pre-data.sql"),
      preData(graph, schemaOf, tables))
    java.nio.file.Files.writeString(dir.resolve("post-data.sql"),
      postData(graph, tables))
  }
}
