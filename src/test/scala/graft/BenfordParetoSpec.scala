package graft

import graft.queries.Relational

/** Teeth for the Benford and Pareto audits beyond the full oracles:
  * the digit histogram conserves orders and its expectation column is
  * exactly the committed constant table (which itself sums to exactly
  * 1e6), and the concentration readout's shares nest sanely — an
  * inverted fence or a ppm overflow breaks the orderings pinned here.
  */
class BenfordParetoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_benford conserves orders against the exact constant table") {
    assert(Relational.benfordPpm.sum == 1000000L,
      "Benford constants do not sum to 1e6")
    val rows = Relational.queries("q_benford")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1 to 9),
      "digits missing — order totals should populate every leading digit")
    val nOrders = Tables.load(spark, dir, "orders").count()
    assert(rows.map(_._2).sum == nOrders, "digit histogram loses orders")
    for ((d, _, obs, ben, dev) <- rows) {
      assert(ben == Relational.benfordPpm(d - 1), s"digit $d expectation")
      assert(dev == obs - ben, s"digit $d deviation")
    }
    val ppmSum = rows.map(_._3).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - 9,
      s"observed ppm mass $ppmSum drifts from 1e6")
  }

  test("q_mad flags a sane robust-outlier tail") {
    // sf0.01: the 5-MAD fence (robust-z 3.5 ≈ 5.2·MAD) needs a real
    // tail to bite — sf0.001 has only ~15 purchase users
    val r = Relational.queries("q_mad")(spark, "/root/testdata/sf0.01")
      .collect().head
    val (n, med, mad, nOut) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getLong(3))
    assert(n > 0 && med > 0 && mad > 0)
    assert(nOut > 0, "the 5-MAD fence flags nothing — spend data has a tail")
    assert(nOut < n / 5, s"the fence flags $nOut of $n — not an outlier screen")
    // the fence is two-sided: the flagged max may sit below the median
    if (!r.isNullAt(4))
      assert(math.abs(r.getLong(4) - med) > 5 * mad,
        "flagged max not past the fence")
  }

  test("q_pareto shares nest: top-1% inside top-10% inside everything") {
    val r = Relational.queries("q_pareto")(spark, dir).collect().head
    val (n, total, n90, n99, s10, s1) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(n > 0 && total > 0)
    assert(n99 <= n90 && n90 <= n, "fence populations do not nest")
    assert(s1 <= s10 && s10 <= 1000000L, "shares do not nest")
    assert(s1 > 0L, "the top 1% holds nothing — fence inverted?")
    // concentration is real: the top decile holds more than its head count
    assert(BigInt(s10) * n > BigInt(1000000L) * n90,
      "top-10% share not above its population share")
  }
}
