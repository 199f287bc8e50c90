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
  * parent key). ONE child scan per CHILD TABLE, not per edge: the
  * edges of a child (lineitem carries three) chain as row-preserving
  * left joins against each edge's DISTINCT parent keys (distinct on
  * the full key tuple + full-tuple equi-join = at most one match per
  * edge, so the chain never inflates row counts even with non-unique
  * source keys), all feeding a single conditional aggregate whose
  * per-edge counters explode back to one output row per edge — the
  * q_dq_profile idiom. A 100-TB fact table is read once however many
  * FKs it carries; each join still co-partitions on its own key,
  * exactly the shuffles the restore's FK validation would pay.
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
    } else g.references.groupBy(_.table).toSeq.sortBy(_._1)
      .map { case (childTable, refs) =>
        val edges = refs.sortBy(_.id)
        val fkCols = edges.flatMap(_.columns).distinct
        val child = load(childTable).select(fkCols.map(col): _*)
        // chain one row-preserving left join per edge; matched rows
        // carry a non-null __p<e>_0 (the join equates it to a non-null
        // FK), unmatched rows carry NULL — so each edge's orphan test
        // is fk-not-null AND __p<e>_0-null, all in ONE child pass
        val joined = edges.zipWithIndex.foldLeft(child) { case (acc, (r, e)) =>
          val parentKeys = load(r.refTable)
            .select(r.refColumns.zipWithIndex.map { case (c, i) =>
              col(c).as(s"__p${e}_$i")
            }: _*)
            .distinct()
          val cond = r.columns.zipWithIndex
            .map { case (c, i) => col(c) === col(s"__p${e}_$i") }
            .reduce(_ && _)
          acc.join(parentKeys, cond, "left_outer")
        }
        val perEdge = edges.zipWithIndex.flatMap { case (r, e) =>
          val fkNotNull = r.columns.map(c => col(c).isNotNull).reduce(_ && _)
          Seq(count(when(!fkNotNull, 1)).as(s"__nn_$e"),
            count(when(fkNotNull && col(s"__p${e}_0").isNull, 1)).as(s"__orph_$e"))
        }
        val aggs = count(lit(1)).as("__n_child") +: perEdge
        joined.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(edges.zipWithIndex.map { case (r, e) =>
            struct(lit(r.id).as("ref_id"),
              lit(r.table).as("child_table"),
              lit(r.refTable).as("parent_table"),
              col("__n_child").as("n_child"),
              col(s"__nn_$e").as("n_null_fk"),
              col(s"__orph_$e").as("n_orphans"))
          }: _*)).as("__e"))
          .select("__e.*")
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
