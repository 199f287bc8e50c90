package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Dedup
import graft.sources.LshIndexStore

/** The standing LSH index round-trips through parquet: reloaded bands
  * produce the same probe candidates as the in-session build, and an
  * appended batch is visible to the next probe. */
class LshIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def index(texts: Seq[(Long, String)]): (DataFrame, DataFrame) = {
    val sh = texts.toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingleHashCol(col("text")).as("sh"))
    (sh, Dedup.streamBands(sh).select("doc_id", "bi", "bk"))
  }

  test("standing index round-trips; probes and appends stay consistent") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different document about spark and shuffles here"),
      (3L, "numbers one two three four five six seven eight nine"))
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "nothing in common with anything stored so far at all"))
    val (sh, bands) = index(corpus)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsh").toString
    LshIndexStore.write(tmp, sh, bands)
    val (sh2, bands2) = LshIndexStore.read(spark, tmp)
    assert(sh2.as[(Long, Seq[Long])].collect().toSet
      == sh.as[(Long, Seq[Long])].collect().toSet)

    val (bsh, bbands) = index(batch)
    def candidates(standing: DataFrame): Set[(Long, Long)] =
      bbands.as("x").join(standing.as("y"),
          col("x.bi") === col("y.bi") && col("x.bk") === col("y.bk"))
        .select(col("y.doc_id").as("a"), col("x.doc_id").as("b"))
        .as[(Long, Long)].collect().toSet
    val fresh = candidates(bands)
    assert(candidates(bands2) == fresh)
    assert(fresh.contains((1L, 10L)), s"near-dup probe must hit: $fresh")

    // the post-ingest append: next probe sees the landed batch
    LshIndexStore.append(tmp, bsh, bbands)
    val (_, bands3) = LshIndexStore.read(spark, tmp)
    assert(bands3.count() == bands.count() + bbands.count())
  }

  test("standing labels round-trip; incremental CC over reloaded labels == from-scratch") {
    import graft.operators.ConnectedComponents
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lbl").toString
    // nightly N: label, persist
    LshIndexStore.writeLabels(tmp, ConnectedComponents.run(oldEdges))
    // nightly N+1: a delta batch arrives (new doc 20 bridges 3 and 11)
    val delta = Seq((3L, 20L), (20L, 11L)).toDF("a", "b")
    val inc = ConnectedComponents.runIncremental(
      LshIndexStore.readLabels(spark, tmp), delta)
    val scratch = ConnectedComponents.run(oldEdges.union(delta))
    assert(inc.as[(Long, Long)].collect().toSet
      == scratch.as[(Long, Long)].collect().toSet,
      "reloaded standing labels must extend exactly like in-session labels")
    // and the superseding write: next session reads the N+1 labels
    LshIndexStore.writeLabels(tmp, inc)
    assert(LshIndexStore.readLabels(spark, tmp).as[(Long, Long)].collect().toSet
      == inc.as[(Long, Long)].collect().toSet)
  }

  test("compaction: probe-equivalent, dups collapsed, retired docs dropped") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different document about spark and shuffles here"),
      (3L, "numbers one two three four five six seven eight nine"))
    val probe = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "numbers one two three four five six seven eight ten"))
    val (sh, bands) = index(corpus)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsh-c").toString
    LshIndexStore.write(tmp, sh, bands)
    // several appends: files accumulate, one batch lands TWICE (retry),
    // and doc 11 is later re-ingested with CHANGED text (new band keys)
    val (bsh, bbands) = index(probe)
    LshIndexStore.append(tmp, bsh, bbands)
    LshIndexStore.append(tmp, bsh, bbands)
    val (msh, mbands) = index(Seq(
      (11L, "totally rewritten text with entirely new words replacing everything")))
    LshIndexStore.append(tmp, msh, mbands)
    def bandFiles() = new java.io.File(
        s"${graft.sources.StagedWrite.resolve(spark, tmp, "bands")}/bands")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val filesBefore = bandFiles()

    val (qsh, qbands) = index(Seq(
      (20L, "the quick brown fox jumps over the lazy dog forever")))
    def candidates(): Set[(Long, Long)] = {
      val (_, standing) = LshIndexStore.read(spark, tmp)
      qbands.as("x").join(standing.as("y"),
          col("x.bi") === col("y.bi") && col("x.bk") === col("y.bk"))
        .select(col("y.doc_id").as("a"), col("x.doc_id").as("b"))
        .as[(Long, Long)].collect().toSet
    }
    val before = candidates()
    assert(before.exists(_._1 == 1L), s"probe must hit the near-dup: $before")

    LshIndexStore.compact(spark, tmp, Seq(3L).toDF("doc_id"), targetFiles = 1)
    // doc 11's version choice is arbitrary; everything else must probe
    // identically to the uncompacted index minus the retired doc
    assert(candidates().filterNot(_._1 == 11L)
        == before.filterNot(p => p._1 == 3L || p._1 == 11L),
      "compaction must not change probe results beyond dropping retired docs")
    val (sh2, bands2) = LshIndexStore.read(spark, tmp)
    assert(sh2.groupBy("doc_id").count().filter(col("count") > 1).isEmpty,
      "re-ingested duplicate rows collapse")
    assert(bands2.select("doc_id").distinct().as[Long].collect().toSet
      == Set(1L, 2L, 10L, 11L), "retired doc gone, everything else kept")
    // whichever version won, bands must be CONSISTENT with the kept
    // shingles (a per-relation dedup could keep one version's shingles
    // and both versions' band keys)
    val rebanded = Dedup.streamBands(sh2).select("doc_id", "bi", "bk")
      .as[(Long, Int, String)].collect().toSet
    assert(bands2.as[(Long, Int, String)].collect().toSet == rebanded,
      "band rows re-derive exactly from the kept shingle rows")
    assert(bands2.filter(col("doc_id") === 11L).count() == 4,
      "one version's 4 band rows for the modified re-ingest, not a union")
    val filesAfter = bandFiles()
    assert(filesAfter < filesBefore && filesAfter == 1,
      s"size-tiered rewrite: $filesBefore -> $filesAfter files")
    // pointer-committed generations: write made gen-1, compact made
    // gen-2; gen-1 stays as reader grace until the NEXT commit
    assert(graft.sources.StagedWrite.resolve(spark, tmp, "bands") == s"$tmp/gen-2")
    assert(new java.io.File(s"$tmp/gen-1").exists(), "grace generation kept")
    LshIndexStore.compact(spark, tmp, Seq.empty[Long].toDF("doc_id"),
      targetFiles = 1)
    assert(graft.sources.StagedWrite.resolve(spark, tmp, "bands") == s"$tmp/gen-3")
    assert(!new java.io.File(s"$tmp/gen-1").exists(),
      "older generations retired on the next commit")
  }
}
