package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each pack object contributes (queries, oracleSql) pairs; names and
  * column aliases match between the Spark side and the DuckDB oracle.
  */
object SparkEntry {
  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (SliceQueries.queries, SliceQueries.oracleSql),
      (Relational.queries, Relational.oracleSql),
      (TransformQueries.queries, TransformQueries.oracleSql),
      (TextAnalysis.queries, TextAnalysis.oracleSql),
      (Curation.queries, Curation.oracleSql),
      (Dedup.queries, Dedup.oracleSql),
      (Similarity.queries, Similarity.oracleSql),
      (MultimodalQueries.queries, MultimodalQueries.oracleSql),
      (PipelineQueries.queries, PipelineQueries.oracleSql),
      (StreamingQueries.queries, StreamingQueries.oracleSql)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("slice_rev_lineitem")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}
