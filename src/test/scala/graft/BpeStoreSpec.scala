package graft

import java.nio.file.Files

import graft.operators.BpeVocab
import graft.queries.TextAnalysis
import graft.sources.BpeStore

/** The persisted tokenizer round-trips EXACTLY — merge order is the
  * contract — and a reloaded tokenizer encodes identically to the
  * in-session one. Retraining overwrites through the same pointer
  * commit every other store uses (generation bump, old gen as grace). */
class BpeStoreSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip preserves merge order; reloaded tokenizer encodes identically") {
    val tmp = Files.createTempDirectory("bpestore").toString
    val docs = Seq("aa ab aa ab abc", "aa ab zz zz").toDF("text")
    val learned = BpeVocab.learn(docs, "text", 5)
    assert(learned.nonEmpty)
    BpeStore.write(spark, tmp, learned)
    assert(BpeStore.read(spark, tmp) == learned, "order + counts exact")

    val words = Seq("aaab", "abc", "zzaa").toDF("w")
    val direct = TextAnalysis.bpeWordTokens(words, learned)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val reloaded = TextAnalysis.bpeWordTokens(words, BpeStore.read(spark, tmp))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(direct == reloaded)

    // retrain lands as the next generation; readers now see the new list
    val learned2 = learned.take(2)
    BpeStore.write(spark, tmp, learned2)
    assert(BpeStore.read(spark, tmp) == learned2)
  }
}
