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
    * keeps ONE shingle row per doc (a re-ingested doc's version choice
    * is arbitrary but CONSISTENT: the kept bands are recomputed from
    * the kept shingles, never unioned across versions), rewrites both
    * relations as `targetFiles` files each, and removes `retired` doc
    * ids; probe results over the compacted index equal an index built
    * fresh from the kept shingle rows (LshIndexStoreSpec holds the
    * equivalence, including the modified-re-ingest case).
    *
    * Crash-safe by staging: the compacted relations land in
    * `path/.compact` first, then swap in via rename pairs whose
    * results are CHECKED — a failure at any point leaves at least one
    * complete copy on disk (a crash between the two renames parks the
    * previous live relation at `path/.old-<name>`; recover by renaming
    * it back or re-running compact after completing the swap by hand).
    *
    * Caller contract: compaction REWRITES the files under `path` —
    * materialize (collect/checkpoint) any live DataFrame still lazily
    * referencing the store before calling, or its next action fails on
    * the moved files (IngestLoopSpec demonstrates the ordering). The
    * `retired` frame itself is evaluated during the stage writes,
    * before any swap, so it may safely derive from the store.
    *
    * @param retired doc_ids to drop (e.g. dedup losers, deleted docs);
    *   joined anti, so it scales past a broadcastable set. */
  def compact(s: SparkSession, path: String, retired: DataFrame,
      targetFiles: Int = 8): Unit = {
    import org.apache.hadoop.fs.Path
    val r = retired.select("doc_id")
    val (sh, _) = read(s, path)
    val stage = s"$path/.compact"
    val kept = sh.join(r, Seq("doc_id"), "left_anti")
      .dropDuplicates("doc_id")
    kept.coalesce(targetFiles)
      .write.mode("overwrite").parquet(s"$stage/shingles")
    // bands derive from the KEPT shingle rows (same stateless per-row
    // projection the ingest stream uses) — deduplicating the two
    // relations independently could keep one version's shingles and
    // BOTH versions' band keys for a doc re-ingested with changed text
    graft.queries.Dedup.streamBands(
        s.read.parquet(s"$stage/shingles").select("doc_id", "sh"))
      .select("doc_id", "bi", "bk")
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(s"$stage/bands")
    // both stage writes are materialized; now swap, checking every
    // rename (HDFS-style filesystems return false instead of throwing)
    val fs = new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)
    def move(from: Path, to: Path): Unit =
      require(fs.rename(from, to), s"compact: rename $from -> $to failed; " +
        "live data is intact, re-run after clearing the target")
    Seq("shingles", "bands").foreach { d =>
      val live = new Path(s"$path/$d")
      val old = new Path(s"$path/.old-$d")
      fs.delete(old, true)
      move(live, old)
      move(new Path(s"$stage/$d"), live)
      fs.delete(old, true)
    }
    fs.delete(new Path(stage), true)
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
    labels.select("id", "cluster").write.mode("overwrite")
      .parquet(s"$path/labels")

  def readLabels(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/labels").select("id", "cluster")
}
