package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents
import graft.queries.Dedup
import graft.sources.LshIndexStore

/** The DEPLOY.md nightly-ingest recipe, end to end through the
  * persisted store: night 0 builds the standing index + labels; night
  * 1's batch probes the RELOADED bands, exact-verifies, extends the
  * RELOADED labels incrementally, appends, retires dedup losers, and
  * compacts — and the resulting state equals the from-scratch
  * computation over everything. */
class IngestLoopSpec extends SparkSpec {
  import spark.implicits._

  private def shOf(texts: Seq[(Long, String)]): DataFrame =
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingleHashCol(col("text")).as("sh"))

  /** The ingest probe with lshPairsIncremental's semantics: the batch
    * bands probe the standing ∪ batch band set, so intra-batch
    * (new-new) pairs are found too — runIncremental's contract needs
    * EVERY edge with a new endpoint. The verify is the one shared
    * Jaccard chain ([[Dedup.jaccardVerified]]). */
  private def probe(batch: DataFrame, standingBands: DataFrame,
      standingSh: DataFrame): DataFrame = {
    val b = Dedup.streamBands(batch)
    val all = standingBands.union(b.select("doc_id", "bi", "bk"))
    val cand = b.as("x").join(all.as("y"),
        col("x.bi") === col("y.bi") && col("x.bk") === col("y.bk")
          && col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b")).distinct()
    val sh = standingSh.unionByName(batch.select("doc_id", "sh"))
    Dedup.jaccardVerified(
      cand.join(sh.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
        .join(sh.select(col("doc_id").as("b"), col("sh").as("shb")), "b"),
      col("sha"), col("shb"), minJac = 0.2)
      .select("a", "b")
  }

  test("three nights with compaction and retirement between batches " +
      "keep standing labels == from-scratch closure") {
    // Retirement policy for this loop: EXACT-duplicate losers (same
    // text, higher id). Retiring an exact loser is closure-preserving:
    // its canonical has the identical shingle set, so any later doc
    // that would have probed the retired loser probes the canonical
    // into the same cluster — which is what lets the standing labels
    // stay equal to the from-scratch closure over EVERY doc ever
    // ingested, night after night, even though the compacted index
    // forgets the losers.
    val night0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today and sleeps"),
      (2L, "the quick brown fox jumps over the lazy dog today and eats"),
      (3L, "an entirely different document about spark shuffles and joins here"))
    val batches = Seq(
      Seq((10L, "an entirely different document about spark shuffles and joins there"),
        (11L, "the quick brown fox jumps over the lazy dog today and sleeps"), // exact dup of 1
        (12L, "completely unrelated content about databases and storage engines")),
      Seq((20L, "an entirely different document about spark shuffles and joins here"), // exact dup of 3
        (21L, "completely unrelated content about databases and storage engines"), // exact dup of 12
        (22L, "fresh words never seen in any earlier document at all tonight")),
      Seq((30L, "the quick brown fox jumps over the lazy dog today and drinks"), // near-dup of retired 11's canonical family
        (31L, "an entirely different document about spark shuffles and joins maybe")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest3").toString

    val sh0 = shOf(night0)
    LshIndexStore.write(tmp, sh0, Dedup.streamBands(sh0).select("doc_id", "bi", "bk"))
    LshIndexStore.writeLabels(tmp,
      ConnectedComponents.run(Dedup.lshPairs(sh0, minJac = 0.2).select("a", "b")))

    var all = night0
    for ((batch, night) <- batches.zipWithIndex) {
      val (shStored, bandsStored) = LshIndexStore.read(spark, tmp)
      val shB = shOf(batch)
      val newPairs = probe(shB, bandsStored, shStored)
      val labels = ConnectedComponents.runIncremental(
        LshIndexStore.readLabels(spark, tmp), newPairs)
      val labelSet = labels.as[(Long, Long)].collect().toSet
      LshIndexStore.writeLabels(tmp, labels)
      LshIndexStore.append(tmp, shB, Dedup.streamBands(shB).select("doc_id", "bi", "bk"))
      all = all ++ batch
      // exact-dup losers across everything ingested so far
      val losers = all.groupBy(_._2).values
        .flatMap(g => g.map(_._1).sorted.drop(1)).toSeq
      LshIndexStore.compact(spark, tmp, losers.toDF("doc_id"), targetFiles = 1)

      val scratch = ConnectedComponents.run(
          Dedup.lshPairs(shOf(all), minJac = 0.2).select("a", "b"))
        .as[(Long, Long)].collect().toSet
      assert(labelSet == scratch,
        s"night ${night + 1}: standing labels must equal from-scratch closure")
      val (shNow, _) = LshIndexStore.read(spark, tmp)
      assert(shNow.select("doc_id").as[Long].collect().toSet
        .intersect(losers.toSet).isEmpty,
        s"night ${night + 1}: retired losers out of the compacted index")
    }
    // the loop exercised what it claims: dups landed and were retired,
    // and a night-3 near-dup still clustered with a family whose
    // earlier members were partly retired
    val finalLabels = LshIndexStore.readLabels(spark, tmp)
      .as[(Long, Long)].collect().toMap
    assert(finalLabels(30L) == finalLabels(1L),
      "near-dup of a partly-retired family joins that family's cluster")
    assert(finalLabels(21L) == finalLabels(12L))
  }

  test("two nights of ingest through the store equal from-scratch") {
    val night0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today and sleeps"),
      (2L, "the quick brown fox jumps over the lazy dog today and eats"),
      (3L, "an entirely different document about spark shuffles and joins here"))
    val batch1 = Seq(
      (10L, "an entirely different document about spark shuffles and joins there"),
      (11L, "nothing shares any shingle with anything else stored so far"),
      (12L, "an entirely different document about spark shuffles and joins maybe"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest").toString

    // night 0: build + persist index and labels
    val sh0 = shOf(night0)
    LshIndexStore.write(tmp, sh0, Dedup.streamBands(sh0).select("doc_id", "bi", "bk"))
    val pairs0 = Dedup.lshPairs(sh0, minJac = 0.2).select("a", "b")
    LshIndexStore.writeLabels(tmp, ConnectedComponents.run(pairs0))

    // night 1: probe the RELOADED store with the batch, extend the
    // RELOADED labels, append the batch, retire losers, compact
    val (shStored, bandsStored) = LshIndexStore.read(spark, tmp)
    val shB = shOf(batch1)
    val newPairs = probe(shB, bandsStored, shStored)
    val labels1 = ConnectedComponents.runIncremental(
      LshIndexStore.readLabels(spark, tmp), newPairs)
    LshIndexStore.writeLabels(tmp, labels1)
    LshIndexStore.append(tmp, shB, Dedup.streamBands(shB).select("doc_id", "bi", "bk"))
    // MATERIALIZE everything still referencing the store before
    // compaction rewrites it (the compact() contract): a lazy frame
    // over the old files fails after the swap
    val newPairSet = newPairs.as[(Long, Long)].collect().toSet
    val labelSet = labels1.as[(Long, Long)].collect().toSet
    // retire the non-canonical member of every dup pair (keep min id)
    val retired = labels1.filter(col("id") =!= col("cluster"))
      .select(col("id").as("doc_id")).localCheckpoint(true)
    LshIndexStore.compact(spark, tmp, retired, targetFiles = 1)

    // labels equal the from-scratch closure over all pairs
    val shAll = shOf(night0 ++ batch1)
    val scratchPairs = Dedup.lshPairs(shAll, minJac = 0.2).select("a", "b")
    val scratch = ConnectedComponents.run(scratchPairs)
      .as[(Long, Long)].collect().toSet
    assert(labelSet == scratch,
      "incremental-through-the-store labels == from-scratch closure")
    assert(newPairSet.contains((3L, 10L)),
      "the near-dup batch doc must have probed its standing partner")
    assert(newPairSet.contains((10L, 12L)),
      "intra-batch (new-new) pairs must be found too")

    // the compacted index: retired docs gone, a night-2 probe of a doc
    // near a RETIRED one hits nothing (its canonical twin differs more)
    val (sh2, bands2) = LshIndexStore.read(spark, tmp)
    val retiredIds = retired.as[Long].collect().toSet
    assert(sh2.select("doc_id").as[Long].collect().toSet
      .intersect(retiredIds).isEmpty, "retired docs out of the index")
    val probe2 = probe(shOf(Seq(
      (20L, "an entirely different document about spark shuffles and joins here"))),
      bands2, sh2)
    assert(probe2.as[(Long, Long)].collect().toSet.map((p: (Long, Long)) => p._1)
      .subsetOf(Set(3L, 10L, 12L) -- retiredIds),
      "a night-2 probe only sees surviving canonicals")
  }
}
