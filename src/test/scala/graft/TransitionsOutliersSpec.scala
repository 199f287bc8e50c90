package graft

import graft.queries.Relational

/** q_transitions / q_outliers teeth beyond the full oracles: the
  * transition matrix equals a naive in-JVM successor count and its
  * row probabilities sum to ~1e6 (floor-division loss bounded by the
  * fan-out), and the IQR screen actually flags someone — a data
  * regression that flattens the spend distribution would silently
  * zero the operator's whole point. */
class TransitionsOutliersSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("transition matrix equals the naive successor count, rows sum to ~1e6") {
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val naive = ev.groupBy(_._1).values.flatMap { g =>
      val o = g.sortBy(e => (e._2, e._3)).map(_._4)
      o.zip(o.drop(1))
    }.groupBy(identity).map { case (p, g) => p -> g.size.toLong }

    val rows = Relational.queries("q_transitions")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == naive)
    for ((from, g) <- rows.groupBy(_._1)) {
      val pSum = g.map(_._4).sum
      assert(pSum <= 1000000L && pSum > 1000000L - g.length,
        s"row $from: probabilities sum to $pSum")
    }
  }

  test("the IQR screen flags real outliers and conserves customers") {
    val rows = Relational.queries("q_outliers")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    assert(rows.length == 5)
    val nCust = Tables.load(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_._2).sum == nCust, "per-region counts lose customers")
    assert(rows.map(r => r._3 + r._4).sum > 0, "screen is toothless: zero outliers")
    for ((r, n, lo, hi) <- rows)
      assert(lo + hi < n, s"region $r flags most of its customers")
  }
}
