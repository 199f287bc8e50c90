package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, col, row_number}

/** Parquet persistence for an IVF-style ANN index — the build-once /
  * query-many split: `Similarity.buildIvfIndex` runs with the nightly
  * corpus job, this writes the result as a standing artifact, and query
  * sessions reload it without touching the build path.
  *
  * Layout: `path/centroids` (K rows, read whole + broadcast) and
  * `path/cells` PARTITIONED BY cid — each cell is its own directory, so
  * a probe of NProbe cells prunes the scan to NProbe directories
  * (partition pruning, asserted by plan-shape spec). At 100 TB the cell
  * files are the index; rewriting one cell after a batch ingest is a
  * directory-sized operation, not an index rebuild. */
object AnnIndexStore {

  /** Cell projection: the base (vec_id, v, n) plus any RANKABLE
    * payload columns the build shipped — today the two sign-signature
    * halves (s1, s2) that make the cells directly probeable by
    * s_ivf_bq's hamming pass without a corpus-side join (the "sigs
    * live IN the index files" contract) — ending with the cid
    * partition column. Deliberately NOT label: historical stores carry
    * a label column their append batches never shipped, so surfacing
    * it would trip [[append]]'s mixed-schema guard on every existing
    * ingest flow (reads drop it, exactly as before round 12). */
  private val Payload = Seq("s1", "s2")
  private def cellCols(df: DataFrame): Seq[String] =
    (Seq("vec_id", "v", "n") ++ Payload.filter(df.columns.contains)) :+ "cid"

  /** Generation-staged + pointer-committed ([[StagedWrite]]): a
    * nightly rebuild killed mid-write must not take the live index
    * with it, on HDFS or on an object store. */
  def write(path: String, centroids: DataFrame, cells: DataFrame): Unit =
    StagedWrite.swapIn(centroids.sparkSession, path, Seq("centroids", "cells")) { st =>
      centroids.coalesce(1).write.mode("overwrite").parquet(s"$st/centroids")
      // cluster rows by cell before the partitioned write: without it
      // every task writes a sliver into every cell directory (tasks *
      // cells small files); with it each cell is one file per owning
      // task — at 100 TB, size the shuffle so each cell's files land
      // near the block size
      cells.repartition(org.apache.spark.sql.functions.col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$st/cells")
    }

  /** (centroids, cells) with the build-side schema restored: partition
    * columns come back type-inferred and appended, so cid is re-cast
    * and the column order re-established. */
  def read(s: SparkSession, path: String): (DataFrame, DataFrame) = {
    val cents = s.read
      .parquet(s"${StagedWrite.resolve(s, path, "centroids")}/centroids")
      .select("cid", "cv", "cn")
    val raw = s.read
      .parquet(s"${StagedWrite.resolve(s, path, "cells")}/cells")
      .withColumn("cid", col("cid").cast("long"))
    val cells = raw.select(cellCols(raw).map(col): _*)
    (cents, cells)
  }

  /** Nearest-centroid assignment — the SAME per-vector argmax rule the
    * index build uses (cosine desc, cid asc tie-break), factored here
    * so batch [[append]] and its equivalence spec share one
    * definition. Per-vector and centroid-set-deterministic: assigning
    * vectors in any batching yields identical cells. */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cid").asc)
    val keep = Seq("vec_id", "v", "n") ++ Payload.filter(vecs.columns.contains)
    vecs.join(broadcast(centroids))
      .select(keep.map(col) :+ col("cid") :+
        graft.functions.VecOps.cosine(col("v"), col("cv"), col("n"), col("cn"))
          .as("ccos"): _*)
      .withColumn("arn", row_number().over(w))
      .filter(col("arn") === 1)
      .select(keep.map(col) :+ col("cid"): _*)
  }

  /** Append one embedding batch to the standing index: new vectors are
    * [[assign]]ed to the EXISTING centroids and their rows land in the
    * live cells relation (partition-clustered, so each touched cell
    * directory gains files rather than the index rewriting). Centroids
    * do not move — standard IVF ingest; centroid drift is repaired by
    * the nightly rebuild, and file growth by [[compact]]. SINGLE-WRITER
    * contract exactly as [[LshIndexStore.append]]: maintenance ops on
    * one store must not overlap a [[compact]]/[[write]] pointer swap.
    * Because assignment is per-vector against a fixed centroid table,
    * append-then-read equals a one-shot assignment of the union
    * (AnnIndexStoreSpec holds the equivalence). */
  def append(s: SparkSession, path: String, newVecs: DataFrame): Unit = {
    val (cents, cells) = read(s, path)
    val batch = assign(newVecs, cents)
    // schema guard: appending a batch whose payload columns differ
    // from the standing files would leave the cells directories with
    // MIXED parquet schemas — without mergeSchema the reload then
    // nondeterministically drops the payload or nulls it on appended
    // rows. A sig-bearing store demands sig-bearing batches; fail
    // loudly at the write, not silently at some later probe.
    require(batch.columns.toSet == cells.columns.toSet,
      s"append batch columns ${batch.columns.sorted.mkString(",")} != " +
        s"standing cell columns ${cells.columns.sorted.mkString(",")} — " +
        "ship the same payload (s1/s2/label) the index was built with")
    batch
      .repartition(col("cid"))
      .write.mode("append").partitionBy("cid")
      .parquet(s"${StagedWrite.resolve(s, path, "cells")}/cells")
  }

  /** Nightly maintenance: drop `retired` vector ids and rewrite each
    * cell as a bounded file count (append grows cells by a file set
    * per batch forever — the same small-file pathology
    * [[LshIndexStore.compact]] exists for). Crash-safe: the compacted
    * relations land in a fresh generation and go live on the one-file
    * pointer commit; a failure leaves the previous generation live.
    * Centroids pass through unchanged. */
  def compact(s: SparkSession, path: String, retired: DataFrame): Unit = {
    val (cents, cells) = read(s, path)
    val kept = cells.join(retired.select("vec_id"), Seq("vec_id"), "left_anti")
    StagedWrite.swapIn(s, path, Seq("centroids", "cells")) { st =>
      cents.coalesce(1).write.mode("overwrite").parquet(s"$st/centroids")
      kept.repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$st/cells")
    }
  }

  /** Cell scan PRUNED to the probed cell ids: the `isin` lands on the
    * raw partition column BEFORE any cast, so it becomes a
    * PartitionFilters entry and the scan reads only those cells'
    * directories — the probe-side contract that makes the standing
    * index sub-linear at 100 TB (plan-asserted in AnnIndexStoreSpec). */
  def readCells(s: SparkSession, path: String, cids: Seq[Long]): DataFrame = {
    val raw = s.read.parquet(s"${StagedWrite.resolve(s, path, "cells")}/cells")
      .filter(col("cid").isin(cids: _*))
      .withColumn("cid", col("cid").cast("long"))
    raw.select(cellCols(raw).map(col): _*)
  }
}
