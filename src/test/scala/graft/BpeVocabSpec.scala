package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeVocab

/** Distributed BPE learning held to a naive in-memory reference: same
  * word-frequency weighting, same deterministic (count desc, pair asc)
  * tie-break, same greedy left-to-right non-overlapping re-merge. */
class BpeVocabSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: the textbook algorithm over a word-count map. */
  private def naive(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
    val counts = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var vocab: Map[List[String], Long] =
      counts.map { case (w, n) => w.map(_.toString).toList -> n }.toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (out.size < k && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case List(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + n
          case _ => ()
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), c) = pairs.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, c))
        vocab = vocab.groupMapReduce(
          { case (syms, _) => BpeVocab.mergePair(syms.toArray, l, r).toList })(
          _._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("distributed merges equal the naive reference, ties included") {
    // 'aaaa' forces the non-overlapping greedy rule ((a,a) counts 3x per
    // word but merges twice); equal-count pairs force the lexicographic
    // tie-break; multi-word lines exercise the frequency weighting
    val texts = Seq(
      "low low low lower lowest",
      "aaaa aaaa baab",
      "new newer newest new new",
      "zz zz yy yy")
    val df = texts.toDF("text")
    val dist = BpeVocab.learn(df, "text", 8)
    assert(dist == naive(texts, 8), s"dist=$dist naive=${naive(texts, 8)}")
  }

  test("early exhaustion: single-char words stop the loop") {
    val df = Seq("a b c", "a b").toDF("text")
    assert(BpeVocab.learn(df, "text", 5) == Seq.empty)
  }

  test("greedy left-to-right merge is non-overlapping") {
    assert(BpeVocab.mergePair(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(BpeVocab.mergePair(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(BpeVocab.mergePair(Array("x", "a", "a"), "a", "a").toSeq == Seq("x", "aa"))
  }
}
