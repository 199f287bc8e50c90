package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.tools.CuratePipeline

class CuratePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curate filters, exact-dedups, and cluster-keeps near-dups") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    val docs = Seq(
      // 1 and 2: exact dups after whitespace normalization
      (1L, base, "en"),
      (2L, base + " ", "en"),
      // 3: near-dup of 1 (one word appended -> high Jaccard)
      (3L, base + "omega", "en"),
      // 4: distinct content, survives
      (4L, "one two three four five six seven eight nine ten " * 8, "en"),
      // 5: too short -> quality-filtered
      (5L, "tiny", "en"))
      .map { case (id, text, lang) => (id, text.trim, lang, text.trim.length) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val dir = Files.createTempDirectory("curate").toString
    docs.write.parquet(s"$dir/documents.parquet")

    val (curated, stages) = CuratePipeline.curate(spark, dir, minQuality = 0.3)
    val kept = curated.select("doc_id").as[Long].collect().toSet
    assert(stages("input") == 5L)
    assert(stages("after_quality") == 4L, "doc 5 fails quality")
    assert(stages("after_exact_dedup") == 3L, "doc 2 is an exact dup of 1")
    // line-dedup: after exact dedup only docs {1,3} share segments
    // (df=2 <= threshold), so nothing is stripped on this corpus
    assert(stages("after_line_dedup") == 3L, "no boilerplate here")
    // near-dedup clusters {1,3} -> canonical selection keeps the
    // higher-QUALITY member (doc 3: one extra word = higher length
    // score), not the min id; 4 untouched
    assert(kept == Set(3L, 4L), s"got $kept")
    // image dedup: ids 3 and 4 render distinct synthetic images
    assert(stages("after_image_dedup") == 2L, "distinct images both survive")
    // span strip after near-dedup: survivors {3,4} share no window
    assert(stages("after_span_strip") == 2L, "nothing left to strip")

    // export stage: every curated doc gets a split + (shard, bin), and
    // they agree with the oracle-verified x_split/x_pack hash contracts
    val out = CuratePipeline.exportSet(curated)
      .select("doc_id", "split", "shard", "bin")
      .as[(Long, String, Int, Int)].collect()
    assert(out.map(_._1).toSet == kept, "export is total over the curated set")
    assert(out.forall(r => Set("train", "val", "test")(r._2)))
    assert(out.forall(r => r._3 >= 0 && r._3 < graft.queries.Curation.PackShards))
    assert(out.forall(_._4 == 0), "tiny corpus: first bin of each shard")

    // JSONL shard export round-trips: newline-delimited JSON under the
    // same (split, shard) directory layout, readable back with the
    // stock json reader and carrying the full curated set
    val shardDir = Files.createTempDirectory("shards").toString
    CuratePipeline.writeShards(CuratePipeline.exportSet(curated), shardDir, "jsonl")
    val back = spark.read.json(shardDir)
    assert(back.select("doc_id").as[Long].collect().toSet == kept)
    assert(back.columns.toSet.contains("split") && back.columns.toSet.contains("shard"),
      "partition columns are recovered from the directory layout")
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(shardDir))
      .iterator().asScala.map(_.toString).filter(_.endsWith(".json")).toList
    assert(files.nonEmpty, "jsonl part files written")
    assert(files.exists(_.contains("split=")), "hive-style split dirs")
    intercept[IllegalArgumentException] {
      CuratePipeline.writeShards(CuratePipeline.exportSet(curated), shardDir, "csvish")
    }
  }

  test("line-dedup stage strips corpus boilerplate and drops all-boilerplate docs") {
    // a shared 4-word cookie banner opens three otherwise-distinct
    // docs (df=3 > threshold 2); doc 9 is NOTHING BUT the banner
    val banner = "accept all cookies now"
    val bodies = Seq(
      (6L, s"$banner alpha beta gamma delta epsilon zeta eta theta " * 5),
      (7L, s"$banner one two three four five six seven eight " * 5),
      (8L, s"$banner red orange yellow green blue indigo violet pink " * 5),
      (9L, (banner + " ") * 5))
    val docs = bodies
      .map { case (id, t) => (id, t.trim, "en", t.trim.length) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val dir = Files.createTempDirectory("curate-line").toString
    docs.write.parquet(s"$dir/documents.parquet")

    val (curated, stages) = CuratePipeline.curate(spark, dir, minQuality = 0.1)
    assert(stages("after_exact_dedup") == 4L)
    assert(stages("after_line_dedup") == 3L,
      "the all-banner doc must drop out entirely")
    val texts = curated.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(!texts.contains(9L))
    texts.values.foreach(t =>
      assert(!t.contains(banner), s"banner must be stripped: $t"))
    assert(texts(6L).startsWith("alpha beta gamma delta"),
      "kept lines reassemble in original order")
    graft.CacheBook.release(spark, "curate")
  }

  test("span-strip stage removes a copied passage from the non-owner only") {
    def ws(n: Int, tag: String): String = (0 until n).map(i => s"$tag$i").mkString(" ")
    // a 15-word passage syndicated from doc 10 into doc 11; the docs
    // are otherwise distinct enough that LSH doc-level dedup must NOT
    // pair them (Jaccard of 3-shingles ~0.25 < 0.5) — exactly the gap
    // the span stage exists for. doc 12 is a MOSAIC: nothing but
    // passages owned elsewhere (the 15-word quote) — it must drop out.
    // 21-word prefix MISALIGNS doc 10's copy of the quote against the
    // 4-word line grid, so the line-dedup stage (positional segments)
    // sees no df>2 line — stride-1 windows catch what aligned lines
    // can't, which is precisely the division of labor between 3b and 4b
    val quote = ws(15, "q")
    val docs = Seq(
      (10L, ws(21, "a") + " " + quote),
      (11L, quote + " " + ws(20, "b")),
      (12L, quote))
      .map { case (id, t) => (id, t, "en", t.length) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val dir = Files.createTempDirectory("curate-span").toString
    docs.write.parquet(s"$dir/documents.parquet")

    val (curated, stages) = CuratePipeline.curate(spark, dir, minQuality = 0.03)
    assert(stages("after_near_dedup") == 3L,
      "partial passage overlap is below the doc-level Jaccard bar")
    assert(stages("after_span_strip") == 2L, "the mosaic doc drops out")
    val texts = curated.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(texts(10L) == ws(21, "a") + " " + quote, "owner keeps its copy")
    assert(texts(11L) == ws(20, "b"), "non-owner loses exactly the passage")
    assert(!texts.contains(12L))
    graft.CacheBook.release(spark, "curate")
  }

  test("image-dedup stage collapses docs whose images hash identically") {
    // ids congruent mod 256 render IDENTICAL synthetic images (the
    // m_phash contract) while these texts are distinct and non-near:
    // the multimodal stage must keep the min-id canonical of the
    // image group and drop the other doc even though its TEXT is new
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8),
      (266L, "one two three four five six seven eight nine ten " * 8))
      .map { case (id, text) => (id, text.trim, "en", text.trim.length) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val dir = Files.createTempDirectory("curate-img").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val (curated, stages) = CuratePipeline.curate(spark, dir, minQuality = 0.3)
    assert(stages("after_near_dedup") == 2L, "texts are not near-dups")
    assert(stages("after_image_dedup") == 1L, "shared image collapses")
    assert(curated.select("doc_id").as[Long].collect().toSet == Set(10L),
      "min-id canonical keeps the image group")
    CacheBook.releaseAll(spark)
  }

  test("decontamination stage drops a paraphrased benchmark leak") {
    val words = (0 until 40).map(i => s"tok$i")
    val benchText = words.mkString(" ")
    // pool doc 20 paraphrases the benchmark (2 word swaps — minority
    // exact 5-gram overlap, Jaccard ~0.86); 21 is unrelated
    val leak = words.updated(10, "swapA").updated(30, "swapB").mkString(" ")
    val clean = (0 until 40).map(i => s"other$i").mkString(" ")
    val pool = Seq((20L, leak), (21L, clean))
      .map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val bench = Seq((900L, benchText))
      .map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val dir = Files.createTempDirectory("curate-pool").toString
    val bdir = Files.createTempDirectory("curate-bench").toString
    pool.write.parquet(s"$dir/documents.parquet")
    bench.write.parquet(s"$bdir/documents.parquet")

    val (curated, stages) =
      CuratePipeline.curate(spark, dir, minQuality = 0.03, Some(bdir))
    assert(stages("after_near_dedup") == 2L, "pool docs are not near-dups")
    assert(stages("after_decontaminate") == 1L, "the leak drops")
    val kept = curated.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(21L), s"got $kept")

    // without a benchmark the stage is absent and nothing drops
    val (c2, s2) = CuratePipeline.curate(spark, dir, minQuality = 0.03)
    assert(!s2.contains("after_decontaminate"))
    assert(c2.select("doc_id").as[Long].collect().toSet == Set(20L, 21L))
    graft.CacheBook.release(spark, "curate")
  }
}
