package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Media-file ingestion — how images/audio/video actually ENTER a
  * pipeline (the gate corpora synthesize media from ids; production
  * reads files). Built on Spark's `binaryFile` source: one row per
  * file with (path, modificationTime, length, content), pushdown on
  * the path glob and a length filter at the SOURCE (both reach the
  * file listing, not a post-scan filter).
  *
  * Scale notes (the parts binaryFile makes easy to get wrong):
  *
  *   - binary files are NOT splittable — read parallelism is the FILE
  *     count, never bytes, so a directory of few huge files
  *     under-parallelizes. [[blobs]] therefore row-balances the
  *     decoded-work input the same way the Multimodal pipelines do —
  *     but by rebalancing only when asked ([[MediaRead.rebalance]]):
  *     the shuffle moves the media BYTES here, which is worth it
  *     exactly once, before a decode fan-out, and never otherwise.
  *   - `spark.sql.sources.binaryFile.maxLength` caps a single file at
  *     ~2 GB (Array[Byte]); video beyond that ships by POINTER (path +
  *     byte range) and the decode stage range-reads — the content
  *     column must stay UNREAD then, which `readMeta` guarantees by
  *     never selecting it (column pruning drops the bytes at the scan).
  *   - `recursiveFileLookup` walks nested date/shard layouts;
  *     `pathGlobFilter` prunes by extension during LISTING, before any
  *     file opens.
  */
object MediaSource {

  /** How a [[read]] result may be rebalanced before heavy per-row work. */
  object MediaRead {
    val rebalance = true
  }

  /** Rows of (path, length, content) for every file under `dir`
    * matching `glob` (e.g. "*.png"), content capped by
    * `maxBytes` (files past the cap are FILTERED OUT here, at the
    * listing side, so a single oversized artifact cannot OOM a task —
    * ship those by pointer instead). */
  def read(spark: SparkSession, dir: String, glob: String,
      maxBytes: Long = 64L << 20): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .filter(col("length") <= maxBytes)
      .select(col("path"), col("length"), col("content"))

  /** Listing-only variant: metadata WITHOUT the bytes — the content
    * column is never selected, so column pruning keeps the scan from
    * reading file bodies at all (manifests, counts, size audits). */
  def readMeta(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("length"), col("modificationTime"))

  /** POINTER-read decode input — the path for media past the
    * binaryFile content cap (long video, raw audio masters): rows
    * carry (path, offset, nbytes) and each task RANGE-reads its slice
    * straight from the file system (HDFS/object store via the Hadoop
    * FS API — `seek` + bounded read, never the whole file). Bytes thus
    * never cross a shuffle and never exceed `nbytes` per row in task
    * memory; parallelism is ROW count (one pointer per segment/chunk),
    * not file count, so a single 100 GB master fans out over its
    * segment pointers. Input columns: `doc_id` LONG, `path` STRING,
    * `offset` LONG, `nbytes` LONG (≤ a sane per-task bound enforced
    * here — a mis-sized pointer must fail loudly, not OOM). */
  def blobsByPointer(pointers: DataFrame, kind: String,
      maxBytes: Long = 64L << 20): Dataset[Multimodal.Blob] = {
    import pointers.sparkSession.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      pointers.sparkSession.sparkContext.hadoopConfiguration)
    pointers.select(col("doc_id").cast("long"), col("path"),
        col("offset").cast("long"), col("nbytes").cast("long"))
      .as[(Long, String, Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, path, off, n) =>
          require(n >= 0 && n <= maxBytes,
            s"pointer $path@$off asks for $n bytes (cap $maxBytes)")
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(conf.value)
          val in = fs.open(p)
          try {
            in.seek(off)
            val buf = new Array[Byte](n.toInt)
            in.readFully(buf)
            Multimodal.Blob(id, buf, kind)
          } finally in.close()
        }
      }
  }

  /** Bridge into the Multimodal pipeline: file rows become [[Multimodal.Blob]]s
    * keyed by a stable id parsed from the file name's trailing digits
    * (the `img_000123.png` convention; files without one get a
    * content-hash-derived id). Optionally row-balanced BEFORE the
    * decode fan-out — the one place shuffling media bytes pays for
    * itself, because binaryFile parallelism is file-count-bound. */
  def blobs(spark: SparkSession, dir: String, glob: String, kind: String,
      rebalance: Boolean = MediaRead.rebalance): Dataset[Multimodal.Blob] = {
    import spark.implicits._
    // regexp_extract yields "" on no match, and ANSI casting "" to
    // BIGINT throws — gate the cast on a non-empty match
    val idStr = regexp_extract(col("path"), "(\\d+)\\.[A-Za-z0-9]+$", 1)
    val raw = read(spark, dir, glob)
      .select(
        coalesce(
          when(idStr =!= lit(""), idStr.cast("long")),
          abs(xxhash64(col("content")))).as("doc_id"),
        col("content").as("bytes"),
        lit(kind).as("kind"))
    val balanced =
      if (rebalance) raw.repartition(spark.sparkContext.defaultParallelism)
      else raw
    balanced.as[Multimodal.Blob]
  }
}
