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
  * Layout: `shingles` (doc_id, sh) and `bands` (doc_id, bi, bk) under
  * the live generation dir resolved through the `CURRENT` pointer
  * ([[StagedWrite]] — object-store-safe commits). Band keys shard well
  * on their own hash — no partition columns (bk is high-cardinality;
  * directory-per-key would be small-file pathology, unlike
  * AnnIndexStore's K-directory cells).
  */
object LshIndexStore {

  /** Generation-staged + pointer-committed ([[StagedWrite]]): a
    * rebuild killed mid-write must not take the live index with it,
    * on HDFS or on an object store. */
  def write(path: String, shingles: DataFrame, bands: DataFrame): Unit =
    StagedWrite.swapIn(shingles.sparkSession, path, Seq("shingles", "bands")) { st =>
      shingles.write.mode("overwrite").parquet(s"$st/shingles")
      bands.write.mode("overwrite").parquet(s"$st/bands")
    }

  /** Append one ingested batch's rows — the post-run bookkeeping that
    * keeps the standing index current. SINGLE-WRITER contract (shared
    * with [[compact]]): maintenance ops on one store must not overlap —
    * an append racing a compact's pointer swap would land its files in
    * a generation that is superseded the next moment, silently losing
    * the batch. The nightly loop is sequential (ingest → append →
    * compact), which satisfies the contract by construction. */
  def append(path: String, shingles: DataFrame, bands: DataFrame): Unit = {
    val s = shingles.sparkSession
    shingles.write.mode("append")
      .parquet(s"${StagedWrite.resolve(s, path, "shingles")}/shingles")
    bands.write.mode("append")
      .parquet(s"${StagedWrite.resolve(s, path, "bands")}/bands")
  }

  /** (shingles, bands) with the build-side column order restored. */
  def read(s: SparkSession, path: String): (DataFrame, DataFrame) = (
    s.read.parquet(s"${StagedWrite.resolve(s, path, "shingles")}/shingles")
      .select("doc_id", "sh"),
    s.read.parquet(s"${StagedWrite.resolve(s, path, "bands")}/bands")
      .select("doc_id", "bi", "bk"))

  /** Nightly maintenance for the standing index: [[append]] grows it
    * by one parquet file set per batch forever (small-file pathology)
    * and never forgets documents the corpus has dropped. Compaction
    * keeps ONE shingle row per doc (a re-ingested doc's version choice
    * is arbitrary but CONSISTENT: the kept bands are recomputed from
    * the kept shingles, never unioned across versions), rewrites both
    * relations as `targetFiles` files each, and removes `retired` doc
    * ids; probe results over the compacted index equal an index built
    * fresh from the kept shingle rows (LshIndexStoreSpec holds the
    * equivalence, including the modified-re-ingest case).
    *
    * Crash-safe via [[StagedWrite]]: the compacted relations land
    * complete in a fresh generation dir and go live only when the
    * one-file pointer commits — a failure at any point leaves the
    * previous generation live and untouched, on HDFS or an object
    * store.
    *
    * Caller contract: SINGLE WRITER (see [[append]]); readers get one
    * generation of grace — a DataFrame planned against the previous
    * generation still scans its files after the swap, until the NEXT
    * commit retires that generation (IngestLoopSpec demonstrates the
    * ordering). The `retired` frame is evaluated during the stage
    * writes, before the commit, so it may safely derive from the
    * store.
    *
    * @param retired doc_ids to drop (e.g. dedup losers, deleted docs);
    *   joined anti, so it scales past a broadcastable set. */
  def compact(s: SparkSession, path: String, retired: DataFrame,
      targetFiles: Int = 8): Unit = {
    val r = retired.select("doc_id")
    val (sh, _) = read(s, path)
    val kept = sh.join(r, Seq("doc_id"), "left_anti")
      .dropDuplicates("doc_id")
    StagedWrite.swapIn(s, path, Seq("shingles", "bands")) { st =>
      kept.coalesce(targetFiles)
        .write.mode("overwrite").parquet(s"$st/shingles")
      // bands derive from the KEPT shingle rows (same stateless per-row
      // projection the ingest stream uses) — deduplicating the two
      // relations independently could keep one version's shingles and
      // BOTH versions' band keys for a doc re-ingested with changed text
      graft.queries.Dedup.streamBands(
          s.read.parquet(s"$st/shingles").select("doc_id", "sh"))
        .select("doc_id", "bi", "bk")
        .coalesce(targetFiles)
        .write.mode("overwrite").parquet(s"$st/bands")
    }
  }

  /** Compaction with nothing retired — pure file/dup hygiene. */
  def compact(s: SparkSession, path: String): Unit =
    compact(s, path, s.range(0).selectExpr("id AS doc_id"))

  /** Persist the nightly run's component labels (id, cluster) — the
    * OTHER standing half of incremental dedup:
    * `ConnectedComponents.runIncremental` extends exactly this
    * labeling with the delta pairs, so the nightly job is
    * read-labels → incremental CC → write-labels, never a from-scratch
    * closure. Overwrite, not append: labels supersede wholesale (an
    * old label may be remapped by a new edge). */
  def writeLabels(path: String, labels: DataFrame): Unit =
    StagedWrite.swapIn(labels.sparkSession, path, Seq("labels")) { st =>
      labels.select("id", "cluster").write.mode("overwrite")
        .parquet(s"$st/labels")
    }

  def readLabels(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"${StagedWrite.resolve(s, path, "labels")}/labels")
      .select("id", "cluster")
}
