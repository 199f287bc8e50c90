package graft

/** Teeth for the Gopher-rules composite filter (x_gopher_filter): each
  * rule is tripped by a purpose-built doc and the column pipeline must
  * equal a naive in-JVM recomputation of the SAME integer rules —
  * n-words bounds, mean-word-length band by cross-multiplication,
  * stopword floor, duplicate-3-gram ceiling — including the fixed
  * reason-code order and the keep<=>ok equivalence. */
class GopherFilterSpec extends SparkSpec {
  import spark.implicits._

  // mirrors TextAnalysis.stopwords (private to the queries package by
  // design); a drift here fails the equality below loudly
  private val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")

  private def naive(text: String): (Int, Int, String) = {
    val w = text.split(" ", -1).toSeq
    val n = w.length
    val wc = text.replace(" ", "").length
    val nStop = w.count(stop)
    val g = (0 to math.max(n - 3, 0)).map(i => w.slice(i, i + 3).mkString(" "))
    val rShort = n < 20
    val rLong = n > 90
    val rWlen = wc.toLong * 1000L < n.toLong * 3800L ||
      wc.toLong * 1000L > n.toLong * 5000L
    val rStop = nStop < 2
    val rRep = (g.size - g.distinct.size).toLong * 50L > g.size
    val reasons = Seq("too_short" -> rShort, "too_long" -> rLong,
      "word_len" -> rWlen, "low_stop" -> rStop, "repetitive" -> rRep)
      .collect { case (code, true) => code }.mkString(",")
    (n, if (reasons.isEmpty) 1 else 0, if (reasons.isEmpty) "ok" else reasons)
  }

  test("each rule fires on its purpose-built doc; pipeline == naive rules") {
    // `ok` has 22 words, mean word length 107/22 = 4.86 (in the
    // [3.8, 5.0] band), two stopwords, all 3-grams distinct; the docs
    // below each break one property
    val ok = "the quick brown foxes jumped over seven lazy hounds and " +
      "twelve other animals right into nine small ponds beside three tall trees"
    val docs = Seq(
      1L -> ok,                                                   // keeps
      2L -> "the short one and done",                             // too_short
      3L -> (1 to 95).map(i => if (i % 9 == 0) "the" else s"word$i").mkString(" "), // too_long
      4L -> ok.replace("foxes", "f").replace("jumped", "up")      // word_len:
        .replace("hounds", "h").replace("animals", "a")           //   mean drops
        .replace("beside", "b"),                                  //   to 83/22
      5L -> ok.replace("the ", "xxe ").replace(" and ", " xnd "), // low_stop
      6L -> (Seq.fill(4)("one two three four") ++
        Seq.fill(9)("the and of it gets longer here okay")).mkString(" "), // repetitive
      7L -> "")                                 // degenerate: empty text
    val out = graft.queries.TextAnalysis.gopherFilter(
        docs.toDF("doc_id", "text"))
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val expected = docs.map { case (id, t) => id -> naive(t) }.toMap
    assert(out == expected,
      s"diff=${expected.keySet.filter(k => out(k) != expected(k))
        .map(k => s"$k: got ${out(k)} want ${expected(k)}")}")
    // the teeth: the keeper keeps, every rule code observed on its doc
    assert(out(1L) == ((22, 1, "ok")))
    assert(out(2L)._3.contains("too_short"))
    assert(out(3L)._3.contains("too_long"))
    assert(out(4L)._3.contains("word_len") && !out(4L)._3.contains("short"))
    assert(out(5L)._3.contains("low_stop"))
    assert(out(6L)._3.contains("repetitive"))
    // multi-reason codes come out in fixed rule order
    assert(out(7L)._3 == "too_short,word_len,low_stop")
    // keep<=>ok holds over the real corpus too
    val real = graft.queries.TextAnalysis.queries("x_gopher_filter")(
      spark, "/root/testdata/sf0.001").as[(Long, Int, Int, String)].collect()
    assert(real.forall(r => (r._3 == 1) == (r._4 == "ok")))
    assert(real.exists(_._3 == 1) && real.exists(_._3 == 0),
      "the sf0.001 corpus must exercise both keep and drop")
  }
}
