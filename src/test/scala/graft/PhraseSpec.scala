package graft

import org.apache.spark.sql.functions._

/** Teeth for s_phrase's intersect-by-offset match that the gate corpus
  * can't exercise: duplicate words inside a phrase, overlapping and
  * repeated occurrences, and near-miss orderings that a bag-of-words
  * match would wrongly accept. */
class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private def search(docs: Seq[(Long, String)], phrase: Seq[String]) = {
    val d = docs.toDF("doc_id", "text")
    val qp = phrase.zipWithIndex
      .map { case (w, j) => (0L, j, w) }.toDF("q", "j", "w")
    graft.queries.Similarity.phraseSearch(d, qp)
      .select("id", "n_hits", "first_pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
  }

  test("duplicate-word phrase matches only the exact pattern") {
    // phrase "the cat the": doc 1 has it, doc 2 has all the words
    // (bag-of-words match) but never consecutively in that order
    val docs = Seq(
      (1L, "a the cat the dog"),
      (2L, "the the cat dog the cat sat"),
      (3L, "cat the cat the cat"))
    // doc 3: "the cat the" occurs at positions 1 AND... tokens are
    // [cat, the, cat, the, cat] -> anchors 1 ("the cat the"? 1:the
    // 2:cat 3:the yes) — one occurrence only
    assert(search(docs, Seq("the", "cat", "the")) ==
      Set((1L, 1, 1), (3L, 1, 1)))
  }

  test("repeated occurrences count and first_pos is the earliest") {
    val docs = Seq(
      (1L, "x a b c y a b c z a b c"),
      (2L, "a b c"),
      (3L, "c b a"))                       // reversed: no match
    assert(search(docs, Seq("a", "b", "c")) ==
      Set((1L, 3, 1), (2L, 1, 0)))
  }

  test("overlapping occurrences of a self-similar phrase all count") {
    // "a a a" in "a a a a a": anchors 0, 1, 2
    val docs = Seq((1L, "a a a a a"), (2L, "a a b a a"))
    assert(search(docs, Seq("a", "a", "a")) == Set((1L, 3, 0)))
  }
}
