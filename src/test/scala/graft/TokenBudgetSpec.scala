package graft

import graft.queries.TextAnalysis

/** x_token_budget teeth: the histogram-threshold selection must
  * (1) meet the budget — kept tokens ≥ 40% of the corpus total,
  * (2) honor the documented overshoot bound — dropping the boundary
  *     bin falls BELOW budget (the kept set exceeds 40% by at most one
  *     bin's tokens, the price of never globally sorting), and
  * (3) be a true top-score selection at bin granularity — every kept
  *     doc's bin ≥ every dropped doc's bin. */
class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("budget met, one-bin overshoot bound, top-score selection") {
    val rows = TextAnalysis.queries("x_token_budget")(
      spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val total = rows.map(_._2).sum
    val kept = rows.filter(_._5)
    val dropped = rows.filterNot(_._5)
    assert(kept.nonEmpty && dropped.nonEmpty)
    val keptTok = kept.map(_._2).sum
    assert(keptTok * 5 >= total * 2, s"kept $keptTok of $total")
    val bmin = kept.map(_._4).min
    val keptAboveBoundary = kept.filter(_._4 > bmin).map(_._2).sum
    assert(keptAboveBoundary * 5 < total * 2,
      s"overshoot exceeds the boundary bin: $keptAboveBoundary of $total")
    assert(dropped.map(_._4).max < bmin)
    // bins are a monotone function of score, so the bin compare is a
    // score compare up to bin width
    assert(kept.map(_._3).min >= bmin * 10000)
  }
}
