package graft

import graft.queries.TextAnalysis

/** x_span_strip owner-keeps contract, held to a naive in-memory
  * reference: a duplicated window survives ONLY in the minimum doc_id
  * containing it; other docs lose the covered positions (overlapping
  * windows union, no double-removal); a doc repeating itself keeps
  * everything; reassembly is exact positional order. */
class SpanStripSpec extends SparkSpec {
  import spark.implicits._

  private val W = 13

  private def naive(docs: Seq[(Long, String)]): Map[Long, (Int, Int, String)] = {
    val words = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val spans = docs.flatMap { case (id, _) =>
      val ws = words(id)
      val n = math.max(ws.length - W, 0)
      (0 to n).map(i => (id, i, ws.slice(i, i + W).mkString(" ")))
    }
    val stats = spans.groupBy(_._3).map { case (sp, xs) =>
      sp -> ((xs.map(_._1).distinct.size, xs.map(_._1).min))
    }
    docs.map { case (id, _) =>
      val ws = words(id)
      val covered = spans.collect {
        case (d, pos, sp) if d == id
          && stats(sp)._1 >= 2 && stats(sp)._2 != id =>
          (pos until math.min(pos + W, ws.length))
      }.flatten.toSet
      val kept = ws.zipWithIndex.collect { case (w, i) if !covered(i) => w }
      id -> ((ws.length, ws.indices.count(covered), kept.mkString(" ")))
    }.toMap
  }

  test("owner keeps, others strip; overlaps union; self-repetition survives") {
    def ws(n: Int, tag: String): String = (0 until n).map(i => s"$tag$i").mkString(" ")
    val shared = ws(20, "s")
    val docs: Seq[(Long, String)] = Seq(
      0L -> (shared + " " + ws(10, "a")), // owner of every shared window
      1L -> (shared + " " + ws(10, "b")), // loses the shared 20 words
      2L -> (ws(7, "c") + " " + shared),  // loses them at an OFFSET
      3L -> (ws(6, "u") + " " + ws(6, "u") + " x"), // repeats itself only
      4L -> ws(30, "v"))                  // untouched
    val got = TextAnalysis.spanStrip(docs.toDF("doc_id", "text"), W).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    val exp = naive(docs)
    assert(got.keySet == exp.keySet)
    exp.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
    // pin the contract by hand, not just by reference-equality
    assert(got(0L)._2 == 0, "owner loses nothing")
    assert(got(1L)._2 == 20 && got(1L)._3 == ws(10, "b"),
      "non-owner loses the whole shared region (windows union)")
    assert(got(2L)._2 == 20 && got(2L)._3 == ws(7, "c"),
      "offset copy strips the same region at its own positions")
    assert(got(3L)._2 == 0, "within-doc repetition is not cross-doc dup")
    assert(got(4L)._2 == 0)
  }

  test("one doc can own one span and lose another") {
    def ws(n: Int, tag: String): String = (0 until n).map(i => s"$tag$i").mkString(" ")
    val a = ws(13, "p") // owned by doc 0
    val b = ws(13, "q") // owned by doc 1, copied into doc 2
    val docs: Seq[(Long, String)] = Seq(
      0L -> (a + " " + ws(5, "x")),
      1L -> (b + " " + a), // owns b, loses a (doc 0 is a's owner)
      2L -> (ws(5, "y") + " " + b))
    val got = TextAnalysis.spanStrip(docs.toDF("doc_id", "text"), W).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    val exp = naive(docs)
    exp.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
    assert(got(0L)._2 == 0)
    assert(got(1L)._2 == 13 && got(1L)._3 == b, "doc 1 keeps what it owns, loses a")
    assert(got(2L)._2 == 13 && got(2L)._3 == ws(5, "y"), "doc 2 loses b to doc 1")
  }
}
