package graft

import graft.queries.TextAnalysis

/** x_line_dedup reassembly: kept lines rejoin in original position
  * order — for an untouched doc the cleaned text IS the original text,
  * and for a doc with drops it equals a naive in-memory reconstruction
  * (exact string compare, no float anywhere). */
class LineDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Seg = 4
  private val DfMax = 2

  private def segments(text: String): Seq[String] =
    text.split(" ", -1).grouped(Seg).map(_.mkString(" ")).toSeq

  test("reassembly preserves original order and drops exactly the high-df lines") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // naive reference: line -> distinct-doc frequency, then per-doc keep
    val df = docs.toSeq
      .flatMap { case (id, t) => segments(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    val expected = docs.map { case (id, t) =>
      val kept = segments(t).filter(l => df(l) <= DfMax)
      id -> (segments(t).size, kept.size, kept.mkString(" "))
    }
    val got = TextAnalysis.queries("x_line_dedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, exp) =>
      assert(got(id) == exp, s"doc $id mismatch")
    }
    // the gate must have teeth on this corpus: some doc actually loses a
    // line, and some doc is untouched (cleaned == text exactly)
    assert(expected.exists { case (id, (n, k, _)) => k < n })
    assert(expected.exists { case (id, (n, k, c)) => k == n && c == docs(id) })
  }
}
