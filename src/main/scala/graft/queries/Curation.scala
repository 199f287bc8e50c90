package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Determinism

/** Pack I — training-data curation/export: the last mile between a
  * scored, deduplicated corpus and a training run. Split assignment,
  * context-window packing, and mixture-weight interleaving are all
  * hash-deterministic (resumable, reproducible across retries — the
  * same contract as the scrub transforms) and shard-parallel: nothing
  * here global-sorts or collects, so every shape survives a 100x
  * corpus. Each query has an exact DuckDB oracle.
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Packing shards: windows partition on a hash shard, never on the
    * whole corpus — a global ORDER BY row_number would serialize into
    * one task. Real pipelines pack per output shard anyway (a training
    * file per shard), so the shard IS the unit of parallelism. */
  val PackShards = 16
  /** Context budget in whitespace tokens per packed bin. */
  val PackBudget = 256

  // column builders shared by the gate queries and CuratePipeline's
  // export stage (same hash contracts -> the pipeline's shards line up
  // with the oracle-verified queries)

  /** train/val/test assignment from the doc id alone (90/5/5). */
  def splitOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val gate = Determinism.md5Idx(concat(lit("spl#"), id.cast("string"))) % 100
    when(gate < 90, "train").when(gate < 95, "val").otherwise("test")
  }

  /** Packing shard from the doc id alone. */
  def shardOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (Determinism.md5Idx(concat(lit("pk#"), id.cast("string"))) % PackShards)
      .cast("int")

  /** Adds (shard, bin) to a frame carrying (idCol, tokensCol):
    * contiguous fixed-budget packing from per-shard exclusive running
    * sums. Overflow bounded by one document; fully shard-parallel. */
  def packed(df: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", shardOf(col(idCol)))
      .withColumn("bin",
        (coalesce(sum(tokensCol).over(w), lit(0L)) / PackBudget).cast("int"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic train/val/test assignment: hash-gated 90/5/5.
    // Membership depends only on (salt, doc_id) — adding documents
    // never reshuffles existing assignments (incremental-safe), and
    // the gate is the same md5 contract the scrub transforms use.
    "x_split" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"), col("lang"), splitOf(col("doc_id")).as("split"))
        .orderBy("doc_id")),

    // sequence packing: documents -> fixed-token-budget bins, the
    // tokenize-and-pack step before writing training shards. Exclusive
    // running token count within a hash shard (doc_id order), bin =
    // that cumsum div budget — contiguous packing whose only
    // approximation is that a bin can overflow by at most one
    // document's tokens (greedy reset-packing needs sequential state;
    // this form is a per-shard window, embarrassingly parallel).
    "x_pack" -> ((s, dir) =>
      packed(
        docs(s, dir).select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens")),
        "doc_id", "n_tokens")
        .select("doc_id", "shard", "bin", "n_tokens")
        .orderBy("doc_id")),

    // reproducible training-order shuffle: within each pack shard the
    // read order is the rank of a keyed hash — deterministic across
    // retries, incremental-safe (a doc's key never changes), and
    // shard-parallel (rank windows partition per shard; a global
    // row_number would collapse to one task). The effective global
    // order is (shard, rank): exactly how a sharded reader consumes it.
    "x_shuffle" -> ((s, dir) => {
      val key = Determinism.md5IdxK(
        concat(lit("shf#"), col("doc_id").cast("string")), 12)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("k", "doc_id")
      docs(s, dir)
        .select(col("doc_id"), shardOf(col("doc_id")).as("shard"), key.as("k"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .select("doc_id", "shard", "rank")
        .orderBy("doc_id")
    }),

    // mixture-weight interleaving: per-source epoch counts (en 2.5x,
    // es 1.5x, rest 1x), the dataset-mixing step of a pretraining run.
    // Fractional weights resolve per document by hash gate — exactly
    // weight*N docs in expectation, deterministic per doc — and each
    // copy carries its epoch index. Output amplification is bounded by
    // ceil(max weight), so the explode cannot blow up a partition.
    "x_mix" -> ((s, dir) => {
      val gate = Determinism.md5Idx(
        concat(lit("mix#"), col("doc_id").cast("string"))) % 100
      val base = when(col("lang") === "en", 2).otherwise(1)
      val frac = when(col("lang").isin("en", "es"), 50).otherwise(0)
      val n = base + (gate < frac).cast("int")
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(0), n - 1)).as("epoch"))
        .select(col("doc_id"), col("lang"), col("epoch").cast("int").as("epoch"))
        .orderBy("doc_id", "epoch")
    })
  )

  private def gateSql(salt: String): String =
    s"(${Determinism.sqlMd5Idx(s"'$salt' || CAST(doc_id AS VARCHAR)")} % 100)"

  val oracleSql: Map[String, String] = Map(
    "x_split" ->
      s"""SELECT doc_id, lang,
           CASE WHEN ${gateSql("spl#")} < 90 THEN 'train'
                WHEN ${gateSql("spl#")} < 95 THEN 'val'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",

    "x_pack" ->
      s"""SELECT doc_id, shard,
           CAST(coalesce(sum(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // $PackBudget AS INT) AS bin,
           n_tokens
         FROM (SELECT doc_id,
             CAST(${Determinism.sqlMd5Idx("'pk#' || CAST(doc_id AS VARCHAR)")} % $PackShards AS INT) AS shard,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
           FROM documents)
         ORDER BY doc_id""",

    "x_shuffle" ->
      s"""SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
             AS INT) AS rank
         FROM (SELECT doc_id,
             CAST(${Determinism.sqlMd5Idx("'pk#' || CAST(doc_id AS VARCHAR)")} % $PackShards AS INT) AS shard,
             ${Determinism.sqlMd5IdxK("'shf#' || CAST(doc_id AS VARCHAR)", 12)} AS k
           FROM documents)
         ORDER BY doc_id""",

    "x_mix" ->
      s"""SELECT doc_id, lang, CAST(unnest(range(0, n)) AS INT) AS epoch
         FROM (SELECT doc_id, lang,
             (CASE WHEN lang = 'en' THEN 2 ELSE 1 END)
             + (CASE WHEN lang IN ('en', 'es') AND ${gateSql("mix#")} < 50
                THEN 1 ELSE 0 END) AS n
           FROM documents)
         ORDER BY doc_id, epoch"""
  )
}
