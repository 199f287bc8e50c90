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
    graft.CacheBook.releaseAll(spark)
  }
}
