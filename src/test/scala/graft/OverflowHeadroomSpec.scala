package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** The sf gates exercise the integer-exact readouts at small
  * magnitudes only; this spec drives the factored readouts with
  * synthetic inputs at the magnitudes the round-9 review flagged
  * (arm totals ~1e12 cents, cells ~1e9 observations) and checks the
  * DECIMAL(38,0) pipeline against independent BigInt floor-division
  * math — an overflow NULLs a column or shifts a value, and either
  * dies here instead of at a real corpus. (BigInt `/` truncates
  * toward zero, matching Spark `div` and DuckDB `//`.)
  */
class OverflowHeadroomSpec extends SparkSpec {

  private def abtestRef(cents: Seq[(Long, Int)]): Seq[BigInt] = {
    val M = BigInt(1000000)
    def arm(a: Int) = cents.filter(_._2 == a).map(c => BigInt(c._1))
    val (a0, a1) = (arm(0), arm(1))
    val (n0, n1) = (BigInt(a0.length), BigInt(a1.length))
    val (s0, s1) = (a0.sum, a1.sum)
    val (q0, q1) = (a0.map(c => c * c).sum, a1.map(c => c * c).sum)
    val var0 = (n0 * q0 - s0 * s0) / (n0 * n0)
    val var1 = (n1 * q1 - s1 * s1) / (n1 * n1)
    val lift = (M * (s1 * n0 - s0 * n1)) / (n1 * n0)
    val wm = (M * var1) / n1 + (M * var0) / n0
    val z2 = (lift * lift) / wm
    Seq(n0, n1, s0, s1, (M * s0) / n0, (M * s1) / n1, var0, var1, lift, z2)
  }

  test("q_abtest readout matches BigInt math at 1e7-cent users") {
    // per-user totals in [$100k, $300k) — two orders beyond any sf
    // gate, inside the documented envelope (whole-cents² variance
    // holds to ~$30M per-user std; the micro-variance this spec
    // originally caught died at ~$10k, and z²'s denominator terms
    // additionally need std ≲ $30k·√n)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val rows = (1 to 40).map { i =>
        (math.abs(rnd.nextLong()) % 20000000L + 10000000L, i % 2)
      }
      import spark.implicits._
      val per = rows.toDF("cents", "arm")
      val out = Relational.abtestReadout(per).collect()
      assert(out.length == 1)
      val r = out.head
      assert(!(0 until 10).exists(r.isNullAt),
        s"overflow NULL in ${r.mkString(",")}")
      val got = (0 until 10).map(i => BigInt(r.getLong(i)))
      val want = abtestRef(rows)
      assert(got == want, s"\n got $got\nwant $want")
    }
  }

  test("q_chisq readout matches BigInt math at 1e9-document cells") {
    val cells = Seq(
      ("a", "x", 400000000L), ("a", "y", 300000000L), ("a", "z", 20000000L),
      ("b", "x", 200000000L), ("b", "y", 50000000L), ("b", "z", 30000000L))
    import spark.implicits._
    val out = Relational.chisqReadout(cells.toDF("lang", "source", "obs"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val M = BigInt(1000000)
    val nn = BigInt(cells.map(_._3).sum)
    val rt = cells.groupBy(_._1).map { case (k, g) => k -> BigInt(g.map(_._3).sum) }
    val ct = cells.groupBy(_._2).map { case (k, g) => k -> BigInt(g.map(_._3).sum) }
    val want = cells.map { case (l, s, o) =>
      val dev = (BigInt(o) * nn - rt(l) * ct(s)) / nn
      val exp = (M * rt(l) * ct(s)) / nn
      val contrib = (M * dev * dev * nn) / (rt(l) * ct(s))
      (l, s) -> (exp, contrib)
    }.toMap
    val chi2 = BigInt(want.values.map(_._2.toLong).sum)
    for (((l, s), (obs, exp, contrib, tot)) <- out) {
      assert(BigInt(obs) == BigInt(cells.find(c => c._1 == l && c._2 == s).get._3))
      assert(BigInt(exp) == want((l, s))._1, s"exp at ($l,$s)")
      assert(BigInt(contrib) == want((l, s))._2, s"contrib at ($l,$s)")
      assert(BigInt(tot) == chi2, "chi2 total")
    }
  }
}
