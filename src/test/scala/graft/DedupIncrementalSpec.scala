package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Incremental-dedup contract: banding only the new batch against the
  * standing band table must produce EXACTLY the from-scratch pairs that
  * touch a new doc — nothing missed, nothing extra. */
class DedupIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("incremental == from-scratch filtered to new-endpoint pairs (corpus)") {
    val dir = "/root/testdata/sf0.001"
    val full = queries.Dedup.queries("d_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the SAME threshold derivation as the d_incremental query (max
    // doc_id over the corpus, not over pair endpoints — those differ
    // whenever the highest doc_id is in no pair)
    val t = Tables.load(spark, dir, "documents")
      .agg(max("doc_id")).head().getLong(0) * 4 / 5
    val expected = full.filter(p => p._1 >= t || p._2 >= t).toSet
    val inc = queries.Dedup.queries("d_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == expected)
    assert(inc.nonEmpty, "the gate must discriminate")
    CacheBook.releaseAll(spark)
  }

  test("incremental == filtered from-scratch on random shingle sets") {
    val rnd = new Random(7)
    val docs = (0L until 60L).map { id =>
      // overlapping pools force shared bands and near-dup pairs
      val pool = 100 + rnd.nextInt(3) * 40
      (id, (0 until 25).map(_ => (pool + rnd.nextInt(60)).toLong)
        .distinct.sorted.toArray)
    }
    val sh = docs.toDF("doc_id", "sh")
    val tNew = 45L
    val full = queries.Dedup.lshPairs(sh, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = queries.Dedup.lshPairsIncremental(sh, 0.2, tNew)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full.filter(p => p._1 >= tNew || p._2 >= tNew))
    assert(inc.subsetOf(full))
  }
}
