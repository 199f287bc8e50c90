package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeVocab

/** Distributed BPE learning held to a naive in-memory reference: same
  * word-frequency weighting, same deterministic (count desc, pair asc)
  * tie-break — pair order compared as unsigned UTF-8 BYTES, matching
  * both Spark's UTF8String ordering and DuckDB's collation (Java
  * String order diverges on supplementary-plane chars) — and the same
  * greedy left-to-right non-overlapping re-merge. */
class BpeVocabSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: the textbook algorithm over a word-count map. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  private def naive(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
    val counts = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var vocab: Map[List[String], Long] =
      counts.map { case (w, n) =>
        w.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toList -> n
      }.toMap
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
        val ord = new Ordering[((String, String), Long)] {
          def compare(p: ((String, String), Long), q: ((String, String), Long)): Int = {
            val c = java.lang.Long.compare(q._2, p._2) // count desc
            if (c != 0) c
            else {
              val cl = utf8Compare(p._1._1, q._1._1)
              if (cl != 0) cl else utf8Compare(p._1._2, q._1._2)
            }
          }
        }
        val ((l, r), c) = pairs.toSeq.min(ord)
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

  test("non-BMP tie-break: UTF-8 byte order, not UTF-16 unit order") {
    // counts tie at 2; U+FFFD (EF BF BD) sorts BELOW U+1F600 (F0 9F 98 80)
    // in UTF-8 bytes but ABOVE it in UTF-16 units (0xFFFD > 0xD83D) —
    // the distributed argmax and this reference must agree byte-wise
    val texts = Seq("\uD83D\uDE00x \uD83D\uDE00x", "\uFFFDy \uFFFDy")
    val df = texts.toDF("text")
    val dist = BpeVocab.learn(df, "text", 2)
    assert(dist == naive(texts, 2), s"dist=$dist naive=${naive(texts, 2)}")
    assert(dist.head._1 == "\uFFFD", s"UTF-8 order puts U+FFFD first: $dist")
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
