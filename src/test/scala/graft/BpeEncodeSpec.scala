package graft


import graft.operators.BpeVocab
import graft.queries.TextAnalysis

/** x_bpe_encode's column pipeline (separator-wrapped chained replace())
  * held to the in-JVM greedy merge chain ([[BpeVocab.mergePair]]) —
  * the same equivalence the x_bpe_merges oracle rests on, here for the
  * ENCODE direction, including the overlap cases ('aaa' under a+a
  * must give [aa, a], not [aa, aa]), merged-symbol chains, and a
  * supplementary-plane char as ONE initial symbol. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def jvmEncode(w: String, merges: Seq[(String, String, Long)]): Int = {
    var syms = w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    merges.foreach { case (l, r, _) => syms = BpeVocab.mergePair(syms, l, r) }
    syms.length
  }

  test("column encode equals the in-JVM greedy merge chain") {
    val merges = Seq(
      ("a", "a", 0L),   // overlap: 'aaa' -> [aa, a]; 'aaaa' -> [aa, aa]
      ("aa", "a", 0L),  // merged-left chain: 'aaa' -> [aaa] on round 2
      ("b", "c", 0L),
      ("bc", "d", 0L),  // merged symbol as LEFT of a further merge
      ("a", "bcd", 0L)) // merged symbol as RIGHT
    val words = Seq(
      "aaa", "aaaa", "aaaaa", "abcd", "abcda", "bcbc", "bcd",
      "xyz", "a", "😀ab", "ab😀cd")
    val got = TextAnalysis
      .bpeWordTokens(words.toDF("w"), merges)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    words.foreach { w =>
      assert(got(w) == jvmEncode(w, merges), s"word '$w'")
    }
    // pin the interesting shapes by hand, not just by reference-equality:
    // greedy overlap ('aaaa' pairs as [aa][aa], never the middle), and
    // chained merges collapsing a word completely
    assert(got("aaa") == 1 && got("aaaa") == 2 && got("aaaaa") == 2)
    assert(got("abcd") == 1 && got("abcda") == 2 && got("bcbc") == 2)
    assert(got("😀ab") == 3, "supplementary char = one symbol")
  }

  test("gate query agrees with a full naive encode at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val merges = BpeVocab.learn(Tables.load(spark, dir, "documents"), "text", 10)
    val expected = docs.map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      val toks = ws.map(jvmEncode(_, merges)).sum
      val cps = ws.map(_.codePoints().count().toInt).sum
      id -> ((ws.length, toks.toLong, (cps.toLong * 1000000L / toks) / 1e6))
    }
    val got = TextAnalysis.queries("x_bpe_encode")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, exp) => assert(got(id) == exp, s"doc $id") }
    // teeth: merges actually fired (tokens < chars for some doc)
    assert(expected.exists { case (_, (_, toks, cpt)) => cpt > 1.0 })
  }
}
