package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet persistence for the standing LSH near-dup index — the
  * artifact both halves of the ingest-dedup story probe:
  * `Dedup.lshPairsIncremental` (nightly batch) and the st_ingest_dedup
  * stream both equi-join new documents' band keys into this relation
  * and exact-verify against the stored shingle sets. Persisting it
  * makes the ingest jobs restart-safe: the corpus is banded once, each
  * ingest reloads instead of rebuilding, and after a batch lands its
  * bands/shingles are appended (parquet append) for the next run.
  *
  * Layout: `path/shingles` (doc_id, sh) and `path/bands`
  * (doc_id, bi, bk). Band keys shard well on their own hash — no
  * partition columns (bk is high-cardinality; directory-per-key would
  * be small-file pathology, unlike AnnIndexStore's K-directory cells).
  */
object LshIndexStore {

  def write(path: String, shingles: DataFrame, bands: DataFrame): Unit = {
    shingles.write.mode("overwrite").parquet(s"$path/shingles")
    bands.write.mode("overwrite").parquet(s"$path/bands")
  }

  /** Append one ingested batch's rows — the post-run bookkeeping that
    * keeps the standing index current. */
  def append(path: String, shingles: DataFrame, bands: DataFrame): Unit = {
    shingles.write.mode("append").parquet(s"$path/shingles")
    bands.write.mode("append").parquet(s"$path/bands")
  }

  /** (shingles, bands) with the build-side column order restored. */
  def read(s: SparkSession, path: String): (DataFrame, DataFrame) = (
    s.read.parquet(s"$path/shingles").select("doc_id", "sh"),
    s.read.parquet(s"$path/bands").select("doc_id", "bi", "bk"))
}
