package graft.sources

import org.apache.spark.sql.SparkSession

/** Parquet persistence for a learned BPE merge list — the tokenizer
  * artifact of the nightly-build story (alongside [[LshIndexStore]]'s
  * near-dup index, [[AnnIndexStore]]'s ANN index, and the standing
  * component labels): `BpeVocab.learn` runs with the corpus job, this
  * writes the ordered merges, and encode jobs
  * (`TextAnalysis.bpeWordTokens`) reload them without re-training.
  * MERGE ORDER IS THE TOKENIZER — the rank column is the contract, and
  * read() restores it exactly.
  *
  * One relation (`merges`, vocab-sized metadata), committed through
  * [[StagedWrite]]'s generation-dir + pointer scheme like every other
  * store: a retrain killed mid-write leaves the live tokenizer intact,
  * on HDFS or an object store. Single-writer contract as elsewhere.
  */
object BpeStore {

  def write(s: SparkSession, path: String,
      merges: Seq[(String, String, Long)]): Unit = {
    import s.implicits._
    StagedWrite.swapIn(s, path, Seq("merges")) { st =>
      merges.zipWithIndex
        .map { case ((l, r, c), i) => (i + 1, l, r, c) }
        .toDF("rank", "left", "right", "cnt")
        .coalesce(1).write.mode("overwrite").parquet(s"$st/merges")
    }
  }

  /** Merges in learned order — the order encode must apply them in. */
  def read(s: SparkSession, path: String): Seq[(String, String, Long)] =
    s.read.parquet(s"${StagedWrite.resolve(s, path, "merges")}/merges")
      .orderBy("rank")
      .collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[Long]("cnt")))
      .toSeq
}
