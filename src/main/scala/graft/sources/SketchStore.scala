package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet persistence for the standing KMV corpus-overlap sketches —
  * the artifact `d_overlap_inc`'s nightly merge reads so an overlap or
  * containment question NEVER re-touches corpus text: one row per
  * (source, h) with h among the source's OverlapK smallest 48-bit
  * shingle hashes. The whole store is S·K rows — index metadata — so
  * unlike the LSH/ANN stores there is no append/compact lifecycle:
  * each nightly merge REWRITES the sketch whole (bottomK(standing ∪
  * delta-hashes), the mergeability the d_overlap_inc gate proves),
  * which is also what keeps the store canonical — a sketch is a value,
  * not a log.
  *
  * Generation-staged + pointer-committed ([[StagedWrite]]) like the
  * other standing artifacts: a merge killed mid-write leaves the
  * previous night's sketch live, on HDFS or an object store.
  */
object SketchStore {

  /** Persist a sketch relation (source, h). Overwrite-whole semantics
    * — see the class note on why sketches rewrite rather than append. */
  def write(path: String, sketch: DataFrame): Unit =
    StagedWrite.swapIn(sketch.sparkSession, path, Seq("sketch")) { st =>
      // one file: the whole store is S·K rows (the AnnIndexStore
      // centroid-file convention) — a shuffle-wide write leaves a
      // directory of near-empty parquet footers
      sketch.select("source", "h").coalesce(1).write.mode("overwrite")
        .parquet(s"$st/sketch")
    }

  /** The live sketch relation, build-side column order restored. */
  def read(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"${StagedWrite.resolve(s, path, "sketch")}/sketch")
      .select("source", "h")
}
