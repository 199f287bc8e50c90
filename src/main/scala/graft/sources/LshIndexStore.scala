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

  /** Nightly maintenance for the standing index: [[append]] grows it
    * by one parquet file set per batch forever (small-file pathology)
    * and never forgets documents the corpus has dropped. Compaction
    * rewrites both relations as `targetFiles` files each, deduplicates
    * re-ingested rows, and removes `retired` doc ids; probe results
    * over the compacted index equal the uncompacted index minus the
    * retired docs (LshIndexStoreSpec holds the equivalence).
    *
    * Crash-safe by staging: the compacted relations land in
    * `path/.compact` first and swap in with two renames — a compaction
    * killed mid-write leaves the live index untouched.
    *
    * @param retired doc_ids to drop (e.g. dedup losers, deleted docs);
    *   joined anti, so it scales past a broadcastable set. */
  def compact(s: SparkSession, path: String, retired: DataFrame,
      targetFiles: Int = 8): Unit = {
    import org.apache.hadoop.fs.Path
    val r = retired.select("doc_id")
    val (sh, bands) = read(s, path)
    val stage = s"$path/.compact"
    sh.join(r, Seq("doc_id"), "left_anti")
      .dropDuplicates("doc_id")
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(s"$stage/shingles")
    bands.join(r, Seq("doc_id"), "left_anti")
      .dropDuplicates("doc_id", "bi", "bk")
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(s"$stage/bands")
    // both stage writes are materialized; now swap
    val fs = new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq("shingles", "bands").foreach { d =>
      fs.delete(new Path(s"$path/$d"), true)
      fs.rename(new Path(s"$stage/$d"), new Path(s"$path/$d"))
    }
    fs.delete(new Path(stage), true)
  }

  /** Compaction with nothing retired — pure file/dup hygiene. */
  def compact(s: SparkSession, path: String): Unit =
    compact(s, path, s.range(0).selectExpr("id AS doc_id"))
}
