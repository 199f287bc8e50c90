package graft

import graft.functions.Determinism

/** x_dsir teeth independent of the SQL oracle: the distributed
  * importance scores must equal a naive in-JVM reference computing the
  * same hashed unigram+bigram features, the same add-one-smoothed
  * target/raw ratio in integer micro-units (two chained floor
  * divisions), and the same per-doc mean — on the real sf0.001 corpus.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def feats(text: String): Seq[Long] = {
    val w = text.split(" ", -1).toSeq
    val bi = if (w.length < 2) Seq(w.mkString(" "))
             else w.sliding(2).map(_.mkString(" ")).toSeq
    (w ++ bi).map(x => Determinism.jvmMd5Idx(x, 12) % 4096L)
  }

  test("distributed scores == naive hashed-ngram importance ratios") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val all = docs.map { case (id, t) => id -> feats(t) }
    val tgtC = all.filter(_._1 < 50).flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rawDocs = all.filter(_._1 >= 50)
    val rawC = rawDocs.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rm = rawC.values.sum * 1000000L / tgtC.values.sum
    def wm(b: Long): Long = (tgtC.getOrElse(b, 0L) + 1L) * rm / (rawC(b) + 1L)

    val expected = rawDocs.map { case (id, fs) =>
      val micro = fs.map(wm).sum / fs.size
      (id, fs.size, micro, micro / 1000000.0, if (micro >= 1000000L) 1 else 0)
    }.toSet

    val got = graft.queries.TextAnalysis.queries("x_dsir")(spark, dir)
      .as[(Long, Int, Long, Double, Int)].collect().toSet
    assert(got == expected,
      s"diff=${(got diff expected).take(3)} / ${(expected diff got).take(3)}")

    // the teeth: scores must differentiate documents (a flat score
    // column would pass a vacuous equality)
    assert(expected.map(_._3).size > 1, "scores must differentiate docs")

    // the resampling half: x_dsir_sample == naive k-smallest
    // key/importance priorities, and the draw must lean target-ward
    // (sampled mean importance above the pool mean)
    val pri = expected.toSeq.map { case (id, _, micro, _, _) =>
      (id, micro,
        Determinism.jvmMd5Idx(s"dsm#$id", 12).toDouble / math.max(micro, 1L))
    }
    val expSample = pri.sortBy { case (id, _, p) => (p, id) }.take(25).toSet
    val gotSample = graft.queries.TextAnalysis.queries("x_dsir_sample")(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(gotSample == expSample,
      s"diff=${(gotSample diff expSample).take(3)} / ${(expSample diff gotSample).take(3)}")
    graft.CacheBook.releaseAll(spark)
  }

  // The sf0.001 corpus's importance weights sit within ~1% of parity
  // (every doc draws from the same synthetic vocabulary), so neither a
  // mean shift nor a membership change is observable there. Direction
  // teeth need a corpus where importance actually spreads: pool docs
  // cloning the target's vocabulary must crowd out docs from a
  // disjoint vocabulary in the importance-weighted draw.
  test("the weighted draw prefers target-like docs when importance spreads") {
    import org.apache.spark.sql.functions.col
    val aWords = (0 until 20).map(i => s"alpha$i")
    val bWords = (0 until 20).map(i => s"beta$i")
    def textOf(ws: Seq[String], seed: Int): String =
      (0 until 30).map(j => ws((seed + j) % ws.size)).mkString(" ")
    val rows =
      (0L until 50L).map(id => (id, textOf(aWords, id.toInt), "en", "tgt", 0L)) ++
      (50L until 100L).map(id => (id, textOf(aWords, id.toInt), "en", "poolA", 0L)) ++
      (100L until 150L).map(id => (id, textOf(bWords, id.toInt), "en", "poolB", 0L))
    val tmp = java.nio.file.Files.createTempDirectory("dsirTeeth").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val sample = graft.queries.TextAnalysis.queries("x_dsir_sample")(spark, tmp)
      .select(col("doc_id")).as[Long].collect()
    val nA = sample.count(_ < 100L)
    assert(nA >= 20,
      s"importance weighting has no teeth: only $nA/25 sampled docs are target-like")
    graft.CacheBook.releaseAll(spark)
  }
}
