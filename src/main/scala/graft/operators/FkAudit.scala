package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.SchemaGraph

/** Referential-integrity audit over a [[SchemaGraph]] — the pre-slice
  * data-quality gate (slicing a database whose FKs dangle produces a
  * slice that will not restore; this is the check that says so first,
  * and the warehouse RI audit in its own right).
  *
  * Per reference edge: total child rows, rows with a NULL FK (legal —
  * optional references), and ORPHANS (non-null FK with no matching
  * parent key). The orphan probe is one anti-join per edge on the FK
  * columns — co-partitioned on the key at scale, exactly the shuffle
  * the restore's own FK validation would pay; the parent side
  * distincts its key first so non-unique keys (TableDef.unique=false)
  * audit correctly. Output is |references| rows however large the
  * tables are.
  */
object FkAudit {

  /** @param load table loader (id -> DataFrame) so tests can feed
    *   hand-corrupted frames. */
  def run(g: SchemaGraph, load: String => DataFrame): DataFrame =
    g.references.sortBy(_.id).map { r =>
      val fkCols = r.columns.map(col)
      val child = load(r.table).select(fkCols: _*)
      val fkNotNull = r.columns.map(c => col(c).isNotNull).reduce(_ && _)
      val parentKeys = load(r.refTable)
        .select(r.refColumns.zipWithIndex.map { case (c, i) =>
          col(c).as(s"__p$i")
        }: _*)
        .distinct()
      val cond = r.columns.zipWithIndex
        .map { case (c, i) => col(c) === col(s"__p$i") }
        .reduce(_ && _)
      val counts = child.agg(
        count(lit(1)).as("n_child"),
        sum(when(!fkNotNull, 1L).otherwise(0L)).as("n_null_fk"))
      val orphans = child.filter(fkNotNull)
        .join(parentKeys, cond, "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      counts.join(orphans)
        .select(lit(r.id).as("ref_id"),
          lit(r.table).as("child_table"), lit(r.refTable).as("parent_table"),
          col("n_child"), col("n_null_fk"), col("n_orphans"))
    }.reduce(_ unionByName _).orderBy("ref_id")

  /** DuckDB mirror generated from the SAME graph object, so the two
    * sides cannot audit different schemas. */
  def oracleSql(g: SchemaGraph): String =
    g.references.sortBy(_.id).map { r =>
      val notNull = r.columns.map(c => s"$c IS NOT NULL").mkString(" AND ")
      val anyNull = r.columns.map(c => s"$c IS NULL").mkString(" OR ")
      val matchCond = r.columns.zip(r.refColumns)
        .map { case (c, p) => s"p.$p = c.$c" }.mkString(" AND ")
      s"""SELECT '${r.id}' AS ref_id, '${r.table}' AS child_table,
           '${r.refTable}' AS parent_table,
           (SELECT count(*) FROM ${r.table}) AS n_child,
           (SELECT count(*) FROM ${r.table} WHERE $anyNull) AS n_null_fk,
           (SELECT count(*) FROM ${r.table} c WHERE $notNull
             AND NOT EXISTS (SELECT 1 FROM ${r.refTable} p
               WHERE $matchCond)) AS n_orphans"""
    }.mkString(" UNION ALL ") + " ORDER BY ref_id"
}
