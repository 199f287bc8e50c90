package graft

import graft.queries.TextAnalysis

/** x_ccnet_buckets' histogram-threshold tercile split must equal the
  * naive per-language sorted cut — including tie pile-ups at the
  * boundary (ties share a label; the head third may then exceed n/3,
  * which is CCNet's own behavior bucketing on equal perplexities). */
class CcnetSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: per language, t1 = smallest score s.t. at least
    * ceil(n/3) scores are <= it (computed by sorting), same for 2n/3. */
  private def naive(rows: Seq[(Long, String, Long)]): Map[Long, String] =
    rows.groupBy(_._2).flatMap { case (_, g) =>
      val sorted = g.map(_._3).sorted
      val n = sorted.size
      def cut(num: Int): Long = sorted((n * num + 2) / 3 - 1)
      val (t1, t2) = (cut(1), cut(2))
      g.map { case (id, _, sc) =>
        id -> (if (sc <= t1) "head" else if (sc <= t2) "middle" else "tail")
      }
    }

  private def run(rows: Seq[(Long, String, Long)]): Map[Long, String] =
    TextAnalysis.ccnetSplit(rows.toDF("doc_id", "lang", "lm_kilo"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap

  test("matches the naive sorted cut across languages") {
    val rows = (1L to 300L).map { i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "de",
        i * 7919 % 97)
    }
    assert(run(rows) == naive(rows))
  }

  test("boundary ties share a label") {
    // 9 docs, scores 1,1,1,1,5,5,9,9,9: t1=1 (cum 4 >= 3), t2=5
    val rows = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L,
      6L -> 5L, 7L -> 9L, 8L -> 9L, 9L -> 9L)
      .map { case (id, sc) => (id, "en", sc) }
    val got = run(rows)
    assert(got == naive(rows))
    assert((1L to 4L).forall(got(_) == "head"))
    assert(got(5L) == "middle" && got(6L) == "middle")
    assert((7L to 9L).forall(got(_) == "tail"))
  }

  test("single-bucket language is all head") {
    val rows = (1L to 7L).map(i => (i, "zh", 42L))
    assert(run(rows).values.forall(_ == "head"))
  }
}
