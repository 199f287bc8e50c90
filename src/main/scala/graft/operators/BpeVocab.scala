package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — the tokenizer-training side of a
  * data pipeline (learn the top-k byte-pair merges from the corpus the
  * model will train on).
  *
  * Scale shape: the corpus collapses to a WORD-FREQUENCY table first
  * (one shuffle over the scan; reference pattern of every large-scale
  * BPE trainer), and all k merge iterations run over that vocab-sized
  * relation — at 100 TB the corpus is petabytes but the distinct-word
  * table is ~10^7 rows, so per-iteration cost is a vocab-sized
  * aggregation plus a driver-side argmax row (metadata, not data).
  * Symbol sequences are per-word arrays; each iteration counts adjacent
  * pairs weighted by word frequency, picks the max — ties broken
  * DETERMINISTICALLY by (pair) lexicographic order so retries and
  * engines agree — and greedily re-merges left-to-right (standard BPE
  * non-overlapping semantics, spec-matched to a naive in-memory
  * reference).
  */
object BpeVocab {

  /** Greedy left-to-right non-overlapping merge of (l, r) in `syms`. */
  private[graft] def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Learn `k` merges from `docs(textCol)` (whitespace-tokenized words,
    * character-initial symbols, no end-of-word marker). Returns merges
    * in learned order as (left, right, weighted pair count). Stops
    * early when no adjacent pair remains. */
  def learn(docs: DataFrame, textCol: String, k: Int): Seq[(String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordsRaw: Dataset[(String, Long)] = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
    // size the ITERATED relation to the data, not to default
    // parallelism: every one of the k iterations maps + shuffles this
    // table, and a 10^3-word vocab spread over 32 partitions pays
    // ~64 task dispatches per iteration for microseconds of work each.
    // ~64k words per partition keeps a 10^7-word production vocab wide
    // (parallelism where there's data) while a test/gate corpus runs
    // each iteration as one task. The count is one job, paid once.
    val nWords = wordsRaw.count()
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nWords / 65536L).toInt + 1))
    val words = wordsRaw.repartition(parts)
    // initial symbols are CODE POINTS, not UTF-16 units: a
    // supplementary-plane char must be one symbol, not two surrogate
    // halves (which would be invalid strings AND disagree with the
    // oracle's per-character split). Tie-breaks downstream compare as
    // UTF8String — unsigned UTF-8 bytes — which is also DuckDB's
    // collation, so all three layers agree on any input.
    var vocab: Dataset[(Array[String], Long)] =
      words.map { case (w, n) =>
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), n)
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = ArrayBuffer.empty[(String, String, Long)]
    // ONE job per iteration: the argmax action below is also what
    // materializes the current generation's lazy persist, and the
    // PREVIOUS generation (read while building this one) unpersists
    // only after that action completes. Each generation persists so
    // lineage stays one map deep instead of replaying the whole merge
    // chain from the word table (O(k^2) without it).
    var prevGen: Option[Dataset[(Array[String], Long)]] = None
    var exhausted = false
    while (merges.size < k && !exhausted) {
      // adjacent-pair counts over the vocab relation, weighted by word
      // frequency; argmax is ONE row to the driver (TakeOrdered with the
      // deterministic tie-break), which then parameterizes the re-merge
      val top = vocab.flatMap { case (syms, n) =>
        (0 until syms.length - 1).map(i => (syms(i), syms(i + 1), n))
      }.toDF("l", "r", "n")
        .groupBy("l", "r").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      prevGen.foreach(_.unpersist(false))
      prevGen = None
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((l, r, c))
        val next = vocab.map { case (syms, n) => (mergePair(syms, l, r), n) }
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prevGen = Some(vocab)
        vocab = next
      }
    }
    prevGen.foreach(_.unpersist(false))
    vocab.unpersist(false)
    merges.toSeq
  }
}
