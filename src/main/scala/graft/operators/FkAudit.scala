package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.SchemaGraph

/** Referential-integrity audit over a [[SchemaGraph]] — the pre-slice
  * data-quality gate (slicing a database whose FKs dangle produces a
  * slice that will not restore; this is the check that says so first,
  * and the warehouse RI audit in its own right).
  *
  * Per reference edge: total child rows, rows with a NULL FK (legal —
  * optional references), and ORPHANS (non-null FK with no matching
  * parent key). ONE child scan per edge: a row-preserving left join
  * against the DISTINCT parent keys (so non-unique keys audit
  * correctly, and each child row matches at most once) feeds a single
  * conditional aggregate — co-partitioned on the key at scale,
  * exactly the shuffle the restore's own FK validation would pay.
  * Counts use count(when(...)), never sum(when(...)): an EMPTY child
  * table must report 0s, not NULLs (sum over zero rows is NULL).
  * Output is |references| rows however large the tables are.
  */
object FkAudit {

  private val outCols = Seq("ref_id", "child_table", "parent_table",
    "n_child", "n_null_fk", "n_orphans")

  /** @param load table loader (id -> DataFrame) so tests can feed
    *   hand-corrupted frames. */
  def run(g: SchemaGraph, load: String => DataFrame): DataFrame =
    if (g.references.isEmpty) {
      val spark = SparkSession.active
      import spark.implicits._
      Seq.empty[(String, String, String, Long, Long, Long)]
        .toDF(outCols: _*)
    } else g.references.sortBy(_.id).map { r =>
      val child = load(r.table).select(r.columns.map(col): _*)
      val fkNotNull = r.columns.map(c => col(c).isNotNull).reduce(_ && _)
      val parentKeys = load(r.refTable)
        .select(r.refColumns.zipWithIndex.map { case (c, i) =>
          col(c).as(s"__p$i")
        }: _*)
        .distinct()
      val cond = r.columns.zipWithIndex
        .map { case (c, i) => col(c) === col(s"__p$i") }
        .reduce(_ && _)
      // matched rows carry a non-null __p0 (the join equates it to a
      // non-null FK); unmatched rows carry NULL — so the orphan test
      // is fk-not-null AND __p0-null, all in one pass
      child.join(parentKeys, cond, "left_outer")
        .agg(count(lit(1)).as("n_child"),
          count(when(!fkNotNull, 1)).as("n_null_fk"),
          count(when(fkNotNull && col("__p0").isNull, 1)).as("n_orphans"))
        .select(lit(r.id).as("ref_id"),
          lit(r.table).as("child_table"), lit(r.refTable).as("parent_table"),
          col("n_child"), col("n_null_fk"), col("n_orphans"))
    }.reduce(_ unionByName _).orderBy("ref_id")

  /** DuckDB mirror generated from the SAME graph object, so the two
    * sides cannot audit different schemas. An FK-free graph yields a
    * valid zero-row query with the same six columns. */
  def oracleSql(g: SchemaGraph): String =
    if (g.references.isEmpty)
      """SELECT CAST(NULL AS VARCHAR) AS ref_id,
         CAST(NULL AS VARCHAR) AS child_table,
         CAST(NULL AS VARCHAR) AS parent_table,
         CAST(NULL AS BIGINT) AS n_child, CAST(NULL AS BIGINT) AS n_null_fk,
         CAST(NULL AS BIGINT) AS n_orphans WHERE false"""
    else g.references.sortBy(_.id).map { r =>
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
