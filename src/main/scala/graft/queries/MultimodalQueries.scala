package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Determinism
import graft.operators.Multimodal

/** Pack G — multimodal plumbing queries. The decode stage is a stub (no
  * codecs in the container) but the schema/partitioning/batching is the
  * real pipeline; features derive from md5 so DuckDB mirrors them. */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // opaque binary + typed metadata
    "m_binary_meta" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .select(col("doc_id"),
          length(col("blob")).as("n_bytes"),
          md5(col("blob")).as("content_hash"),
          lit("text/plain").as("kind"))
        .orderBy("doc_id")),

    // mapPartitions decode -> features (typed Dataset path)
    "m_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.blobs(s, Tables.load(s, dir, "documents")))
        .toDF().orderBy("doc_id")),

    // aspect-preserving resize plan (longest edge -> 64), exact integer
    // shape math over the batched pipeline; pixel scaling is the stub
    "m_resize" -> ((s, dir) =>
      Multimodal.resize(
        Multimodal.blobs(s, Tables.load(s, dir, "documents")), target = 64)
        .toDF().orderBy("doc_id")),

    // frame sampling: one row per stride-sampled frame (explode-shaped
    // stage a video pipeline feeds into per-frame embedding)
    "m_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.blobs(s, Tables.load(s, dir, "documents")), stride = 8)
        .toDF().orderBy("doc_id", "frame_idx"))
  )

  private def f(seedSql: String): String = Determinism.sqlMd5IdxK(seedSql, 6)

  val oracleSql: Map[String, String] = Map(
    // strlen (bytes), not length (characters): Spark's length(blob)
    // counts BYTES of the UTF-8 cast, so the two agree only while the
    // corpus is pure ASCII unless the oracle counts bytes too.
    "m_binary_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes,
           md5(text) AS content_hash, 'text/plain' AS kind
         FROM documents ORDER BY doc_id""",

    "m_features" ->
      s"""SELECT doc_id,
           CAST(16 + ${f("text")} % 1024 AS INT) AS width,
           CAST(16 + ${f("md5(text) || 'h'")} % 1024 AS INT) AS height,
           CAST(1 + ${f("md5(text) || 'f'")} % 64 AS INT) AS n_frames,
           ((${f("md5(text) || 'i'")} % 256) / 255.0) AS mean_intensity
         FROM documents ORDER BY doc_id""",

    "m_resize" ->
      s"""WITH dims AS (SELECT doc_id,
             CAST(16 + ${f("text")} % 1024 AS INT) AS width,
             CAST(16 + ${f("md5(text) || 'h'")} % 1024 AS INT) AS height
           FROM documents)
         SELECT doc_id, width, height,
           CAST(greatest(1, (width * 64) // greatest(width, height)) AS INT) AS out_w,
           CAST(greatest(1, (height * 64) // greatest(width, height)) AS INT) AS out_h
         FROM dims ORDER BY doc_id""",

    "m_frames" ->
      s"""WITH nf AS (SELECT doc_id, text,
             CAST(1 + ${f("md5(text) || 'f'")} % 64 AS INT) AS n
           FROM documents)
         SELECT doc_id, CAST(i AS INT) AS frame_idx,
           ((${f("md5(text) || '#' || CAST(i AS VARCHAR)")} % 256) / 255.0) AS brightness
         FROM nf, unnest(range(0, n, 8)) AS t(i)
         ORDER BY doc_id, frame_idx"""
  )
}
