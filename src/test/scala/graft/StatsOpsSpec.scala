package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._

/** Teeth for the round-14 stats sextet beyond the full oracles:
  * q_cov's floored moments equal a naive BigInt recomputation,
  * q_cusum's trajectory telescopes (last cusum = total deviation) and
  * flags exactly the |CUSUM| argmax, q_seasonal's baselines are the
  * naive per-weekday means, q_small_qty selects exactly the naive
  * below-0.2·avg set, q_attribution conserves purchases across its
  * latency buckets against a naive last-click walk, and q_rfm's grid
  * conserves customers with every score in range. A unit slip or an
  * engine-specific floor would die here, not at 100 TB.
  */
class StatsOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_cov equals a naive BigInt moment recomputation") {
    val rows = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(floor(CAST(l_quantity AS DECIMAL(18,2)) * 1000) AS BIGINT)"),
        expr("CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)"),
        expr("CAST(floor(CAST(l_discount AS DECIMAL(8,4)) * 10000) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = Relational.queries("q_cov")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == rows.map(_._1).toSet)
    for ((flag, g) <- rows.groupBy(_._1)) {
      val n = BigInt(g.length)
      def cov(a: (String, Long, Long, Long) => Long,
          b: (String, Long, Long, Long) => Long): Long = {
        val sa = g.map(t => BigInt(a.tupled(t))).sum
        val sb = g.map(t => BigInt(b.tupled(t))).sum
        val sab = g.map(t => BigInt(a.tupled(t)) * b.tupled(t)).sum
        // the query's +K shift keeps the numerator positive so both
        // engines' integer divisions agree; replay it here
        val k = BigInt("1000000000000")
        ((n * sab - sa * sb + k * n * n) / (n * n) - k).toLong
      }
      val r = got(flag)
      assert(r.getLong(1) == g.length.toLong)
      val x = (_: String, x: Long, _: Long, _: Long) => x
      val y = (_: String, _: Long, y: Long, _: Long) => y
      val z = (_: String, _: Long, _: Long, z: Long) => z
      assert(r.getLong(2) == cov(x, x), s"$flag var_x")
      assert(r.getLong(3) == cov(y, y), s"$flag var_y")
      assert(r.getLong(4) == cov(z, z), s"$flag var_z")
      assert(r.getLong(5) == cov(x, y), s"$flag cov_xy")
      assert(r.getLong(6) == cov(x, z), s"$flag cov_xz")
      assert(r.getLong(7) == cov(y, z), s"$flag cov_yz")
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0 && r.getLong(4) >= 0,
        "negative variance")
    }
  }

  test("q_cusum telescopes and flags exactly the |CUSUM| argmax") {
    val rows = Relational.queries("q_cusum")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.length > 300, "daily grain missing days")
    val tot = rows.map(t => BigInt(t._2)).sum
    val mean = tot / rows.length
    // telescoping: the final cusum is the total deviation mass
    assert(BigInt(rows.last._3) == tot - mean * rows.length,
      "last cusum != total deviation")
    // running check on a naive replay
    var acc = BigInt(0)
    for (t <- rows) {
      acc += BigInt(t._2) - mean
      assert(BigInt(t._3) == acc, s"cusum drifts at day ${t._1}")
    }
    val peak = rows.map(t => t._3.abs).max
    assert(rows.forall(t => (t._4 == 1) == (t._3.abs == peak)),
      "changepoint flag is not the |CUSUM| argmax")
    assert(rows.count(_._4 == 1) >= 1)
  }

  test("q_seasonal baselines are the naive per-weekday means") {
    val rows = Relational.queries("q_seasonal")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byDow = rows.groupBy(_._2)
    assert(byDow.keySet == (0 to 6).toSet, "missing weekdays")
    for ((dow, g) <- byDow) {
      val base = (BigInt(1000000) * g.map(t => BigInt(t._3)).sum / g.length).toLong
      assert(g.forall(_._4 == base), s"dow $dow baseline drifts")
      for (t <- g)
        assert(t._5 == (BigInt("1000000000000") * t._3 / base).toLong,
          s"ratio drifts at day ${t._1}")
    }
  }

  test("q_small_qty selects exactly the naive below-threshold set") {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(floor(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT)").as("qty"),
        expr("CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val avgMicro = li.groupBy(_._1).map { case (pk, g) =>
      pk -> (BigInt(1000000) * g.map(t => BigInt(t._2)).sum / g.length).toLong }
    val brand = Tables.load(spark, dir, "part")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val naive = li.filter(t => t._2 * 5000000L < avgMicro(t._1))
      .groupBy(t => brand(t._1))
      .map { case (b, g) => b -> (g.length.toLong, g.map(_._3).sum) }
    val got = Relational.queries("q_small_qty")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == naive, "brand rollup diverges from the naive selection")
    assert(got.values.map(_._1).sum > 0, "no small-quantity items at all")
  }

  test("q_attribution conserves purchases against a naive last-click walk") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(floor(CAST(value AS DECIMAL(18,6)) * 1000000) AS BIGINT)").as("vm"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val clicksBy = ev.filter(_._2 == "click").groupBy(_._1)
    val naive = ev.filter(_._2 == "purchase").map { p =>
      val prior = clicksBy.getOrElse(p._1, Array.empty)
        .filter(c => c._4 < p._4 && p._4 - c._4 <= 604800000000L)
        .sortBy(c => (-c._4, -c._3)).headOption
      val bucket = prior match {
        case None => "4_organic"
        case Some(c) if p._4 - c._4 <= 3600000000L => "1_hour"
        case Some(c) if p._4 - c._4 <= 86400000000L => "2_day"
        case Some(_) => "3_week"
      }
      (bucket, p._5)
    }
    val naiveAgg = naive.groupBy(_._1)
      .map { case (b, g) => b -> (g.length.toLong, g.map(_._2).sum) }
    val got = Relational.queries("q_attribution")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == naiveAgg, "bucket histogram diverges from the naive walk")
    assert(got.values.map(_._1).sum == naive.length.toLong,
      "buckets lose purchases")
  }

  test("q_rfm conserves customers with scores in range") {
    val rows = Relational.queries("q_rfm")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val nCust = Tables.load(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_._4).sum == nCust, "grid loses customers")
    assert(rows.forall(t => t._1 >= 1 && t._1 <= 5
      && t._2 >= 1 && t._2 <= 5 && t._3 >= 1 && t._3 <= 5), "score out of range")
    // quintiles put roughly a fifth of customers at each recency score
    val byR = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(byR.size == 5, s"recency scores collapsed: ${byR.keySet}")
    assert(byR.values.forall(n => n > nCust / 20), "a recency quintile is empty-ish")
    assert(rows.forall(_._5 > 0), "non-positive mean spend")
  }

  test("q_gini's bucketed rank path equals a naive sorted BigInt replay") {
    // per-customer cents exactly as the query derives them
    val per = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(expr("CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100) AS BIGINT)").as("cents"))
      .join(Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg")),
        col("o_custkey") === col("c_custkey"))
      .select("seg", "cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = Relational.queries("q_gini")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet == per.map(_._1).toSet)
    for ((seg, n, sumCents, giniPpm) <- got) {
      // the sort the distributed path avoids — ground truth here
      val xs = per.filter(_._1 == seg).map(t => BigInt(t._2)).sorted
      val bn = BigInt(xs.length)
      val sx = xs.sum
      val s1 = xs.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      assert(n == xs.length && BigInt(sumCents) == sx)
      val expect = (BigInt(1000000) * (2 * s1 - (bn + 1) * sx)) / (bn * sx)
      assert(BigInt(giniPpm) == expect, s"$seg: $giniPpm vs $expect")
      assert(giniPpm >= 0 && giniPpm < 1000000)
    }
  }

  test("q_acf equals a naive BigInt replay and respects Cauchy-Schwarz") {
    val daily = Tables.load(spark, dir, "orders")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        expr("CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)").as("cents"))
      .groupBy("day").agg(sum("cents").as("x"))
      .collect().map(r => (r.getLong(0), BigInt(r.getLong(1))))
      .sortBy(_._1)
    val n = BigInt(daily.length)
    val s = daily.map(_._2).sum
    val mean = s / n // floored, exactly as both engines compute it
    val dev = daily.map { case (d, x) => (d, x - mean) }.toMap
    val den = dev.values.map(v => v * v).sum
    val got = Relational.queries("q_acf")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (1 to 7))
    for ((lag, nPairs, acfPpm) <- got) {
      val pairs = dev.keys.filter(d => dev.contains(d + lag)).toSeq
      assert(nPairs == pairs.length)
      val num = pairs.map(d => dev(d) * dev(d + lag)).sum
      val expect = ((BigInt(1000000) * num + BigInt(2000000) * den) / den
        - BigInt(2000000)).toLong
      assert(acfPpm == expect, s"lag $lag: $acfPpm vs $expect")
      assert(acfPpm.abs <= 1000000, "ACF outside [-1, 1]")
    }
  }

  test("q_basket_pairs marginals and lift check out against a naive replay") {
    val ob = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("brand"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val nOrders = ob.map(_._1).distinct.length
    val bcnt = ob.groupBy(_._2).map { case (b, g) => b -> g.length }
    val naive = ob.groupBy(_._1).values.toSeq.flatMap { g =>
      val bs = g.map(_._2).sorted.toSeq
      for (a <- bs; b <- bs if a < b) yield (a, b)
    }.groupBy(identity).map { case (p, g) => p -> g.size }
      .filter(_._2 >= 3)
    val got = Relational.queries("q_basket_pairs")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == naive.keySet)
    for ((pair, (sup, conf, lift)) <- got) {
      assert(sup == naive(pair))
      assert(conf == 1000000L * sup / bcnt(pair._1))
      assert(lift == (BigInt(1000000) * sup * nOrders
        / (BigInt(bcnt(pair._1)) * bcnt(pair._2))).toLong)
      // lift clusters around 1e6 when brands co-occur independently
      assert(lift > 100000L && lift < 10000000L, s"absurd lift $lift")
    }
  }

  test("q_runs equals a naive run-length walk") {
    val days = Tables.load(spark, dir, "orders")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"),
        expr("CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap.toSeq.sorted
    val n = days.length
    val med = days.map(t => (t._2, t._1)).sorted.apply((n + 1) / 2 - 1)._1
    val signs = days.map(_._2 > med)
    val runs = 1 + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    val nAbove = signs.count(identity).toLong
    val got = Relational.queries("q_runs")(spark, dir).collect()(0)
    assert(got.getLong(0) == n && got.getLong(1) == nAbove)
    assert(got.getLong(2) == n - nAbove)
    assert(got.getLong(3) == runs, s"runs ${got.getLong(3)} want $runs")
    assert(got.getLong(4) ==
      2000000L * nAbove * (n - nAbove) / n + 1000000L)
    // a revenue series around its median behaves run-wise like a fair
    // coin unless it trends hard: observed within 30% of expectation
    val exp = got.getLong(4) / 1000000.0
    assert(math.abs(runs - exp) < 0.3 * exp, s"runs $runs vs E $exp")
  }

  test("q_ks equals a naive pooled-ECDF replay") {
    val rows = Tables.load(spark, dir, "orders")
      .select(expr("CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)"),
        expr("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val nA = rows.count(_._2 == 1).toLong
    val nB = rows.length - nA
    val byV = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var ca = 0L; var cb = 0L
    val curve = byV.map { case (v, g) =>
      ca += g.count(_._2 == 1); cb += g.count(_._2 == 0)
      (v, math.abs(1000000L * ca / nA - 1000000L * cb / nB))
    }
    val (atV, d) = curve.maxBy(t => (t._2, -t._1))
    val got = Relational.queries("q_ks")(spark, dir).collect()(0)
    assert(got.getLong(0) == nA && got.getLong(1) == nB)
    assert(got.getLong(2) == d, s"D ${got.getLong(2)} want $d")
    assert(got.getLong(3) == atV, s"argmax ${got.getLong(3)} want $atV")
    // priority is assigned independently of totals here: D stays small,
    // but it is a max of |ECDF gaps| so it is never exactly zero
    assert(d > 0L && d < 200000L, s"implausible D $d")
  }

  test("q_trimmed equals a naive sort-and-drop replay") {
    val rows = Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority"),
        expr("CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = Relational.queries("q_trimmed")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == rows.map(_._1).toSet)
    for ((grp, g) <- rows.groupBy(_._1)) {
      val xs = g.map(_._2).sorted
      val n = xs.length; val k = n / 10
      val kept = xs.slice(k, n - k)
      val (gn, gk, mean, trm) = got(grp)
      assert(gn == n && gk == k)
      assert(mean == (BigInt(1000000) * xs.map(BigInt(_)).sum / n).toLong)
      assert(trm == (BigInt(1000000) * kept.map(BigInt(_)).sum
        / kept.length).toLong, s"$grp trimmed")
      // trimming 10% tails moves a location estimate, it doesn't teleport it
      assert(math.abs(trm - mean) < mean / 5, s"$grp trim distance")
    }
  }

  test("q_basket_triples equals a naive triple count (Apriori prune loses nothing)") {
    val ob = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("brand"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val baskets = ob.groupBy(_._1).values.map(_.map(_._2).sorted.toSeq).toSeq
    // the naive count has NO candidate pruning: equality proves the
    // Apriori prune is lossless, not just fast
    val pairSup = baskets.flatMap(bs =>
      for (a <- bs; b <- bs if a < b) yield (a, b))
      .groupBy(identity).map { case (p, g) => p -> g.size }
    val naive = baskets.flatMap(bs =>
      for (a <- bs; b <- bs if a < b; c <- bs if b < c) yield (a, b, c))
      .groupBy(identity).map { case (tr, g) => tr -> g.size }
      .filter(_._2 >= 3)
    val got = Relational.queries("q_basket_triples")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == naive.keySet)
    assert(got.nonEmpty)
    for ((tr, (sup, conf)) <- got) {
      assert(sup == naive(tr), s"$tr support")
      assert(conf == 1000000L * sup / pairSup((tr._1, tr._2)), s"$tr conf")
      // anti-monotonicity: triple support never exceeds its pair's
      assert(sup <= pairSup((tr._1, tr._2)))
    }
  }

  test("q_mwu equals a naive midrank replay") {
    val rows = Tables.load(spark, dir, "orders")
      .select(expr("CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)"),
        expr("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // naive doubled midranks: sort, then a tie block spanning sorted
    // positions [i+1, i+c] has midrank (2i + c + 1) / 2
    val sorted = rows.sortBy(_._1)
    val rank2 = collection.mutable.Map.empty[Long, Long]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      rank2(sorted(i)._1) = 2L * i + (j - i) + 1
      i = j
    }
    val nA = rows.count(_._2 == 1).toLong
    val nB = rows.length - nA
    val r2a = rows.filter(_._2 == 1).map(r => BigInt(rank2(r._1))).sum
    val u2 = r2a - BigInt(nA) * (nA + 1)
    val cles = BigInt(1000000) * u2 / (2 * BigInt(nA) * nB)
    val got = Relational.queries("q_mwu")(spark, dir).collect()(0)
    assert(got.getLong(0) == nA && got.getLong(1) == nB)
    assert(BigInt(got.getLong(2)) == u2, s"u2 ${got.getLong(2)} vs $u2")
    assert(BigInt(got.getLong(3)) == cles)
    assert(got.getLong(4) == got.getLong(3) * 2 - 1000000L)
    // priority is independent of spend in the synthetic data: the
    // effect size must sit near 1/2, not at a degenerate extreme
    assert(got.getLong(3) > 300000L && got.getLong(3) < 700000L)
  }

  test("q_kendall equals a naive pair count and reads a positive trend") {
    val d = Tables.load(spark, dir, "orders")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        expr("CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)").as("cents"))
      .groupBy("day").agg(sum("cents").as("rev"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var conc = 0L; var disc = 0L; var pairs = 0L
    for (a <- d; b <- d if a._1 < b._1) {
      pairs += 1
      val s = java.lang.Long.signum(a._2 - b._2) * java.lang.Long.signum(a._3 - b._3)
      if (s > 0) conc += 1 else if (s < 0) disc += 1
    }
    val got = Relational.queries("q_kendall")(spark, dir).collect()(0)
    assert(got.getLong(0) == pairs && got.getLong(1) == conc
      && got.getLong(2) == disc)
    val expect = ((BigInt(1000000) * (conc - disc) + BigInt(2000000) * pairs)
      / pairs - 2000000).toLong
    assert(got.getLong(3) == expect)
    // revenue is order-count driven: the association must be strongly
    // positive — a sign slip in the CASE chains would flip this
    assert(got.getLong(3) > 200000L, s"tau ${got.getLong(3)}")
  }

  test("q_bootstrap equals a naive replay and resamples around the mean") {
    val rows = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def u(b: Int, key: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bs#$b#$key".getBytes("UTF-8")).map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16) % 1000000L
    }
    def w(uv: Long): Long = {
      val idx = Relational.poissonCdfPpm.indexWhere(uv < _)
      if (idx < 0) Relational.poissonCdfPpm.size.toLong else idx.toLong
    }
    val got = Relational.queries("q_bootstrap")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (0 until Relational.BootstrapB))
    val trueMeanMicro = BigInt(1000000) * rows.map(r => BigInt(r._2)).sum / rows.length
    for ((b, nEff, meanMicro) <- got) {
      val ws = rows.map { case (k, c) => (w(u(b, k)), c) }
      assert(nEff == ws.map(_._1).sum, s"replicate $b n_eff")
      val expect = BigInt(1000000) * ws.map { case (x, c) => BigInt(x) * c }.sum /
        ws.map(_._1).sum
      assert(BigInt(meanMicro) == expect, s"replicate $b mean")
      // Poisson(1) weights: n_eff concentrates near n (±5 sigma ~ 5*sqrt(n))
      assert(math.abs(nEff - rows.length) < 5 * math.sqrt(rows.length) + 10)
      // each replicate mean sits within a few SEM of the point estimate
      assert((BigInt(meanMicro) - trueMeanMicro).abs < trueMeanMicro / 10)
    }
    // the distribution has spread: not every replicate collapses to one value
    assert(got.map(_._3).distinct.length > Relational.BootstrapB / 2)
  }

  test("q_theilsen equals a naive pairwise-median replay") {
    val days = Tables.load(spark, dir, "orders")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"),
        expr("CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(g => g.map(_._2).sum).toMap
      .toSeq.sorted
    val k = Relational.TheilShift
    val slopes = (for {
      (da, ra) <- days; (db, rb) <- days if da < db
    } yield {
      val s = ((BigInt(1000000) * (BigInt(rb) - ra) + k * (db - da))
        / (db - da) - k).toLong
      (s, da, db)
    }).sorted
    val nP = slopes.length
    val slope = slopes((nP + 1) / 2 - 1)._1
    val resid = days.map { case (d, r) =>
      (BigInt(1000000) * r - BigInt(slope) * d, d) }.sorted
    val nD = days.length
    val intercept = resid((nD + 1) / 2 - 1)._1.toLong
    val got = Relational.queries("q_theilsen")(spark, dir).collect()(0)
    assert(got.getLong(0) == nD && got.getLong(1) == nP)
    assert(got.getLong(2) == slope, s"slope ${got.getLong(2)} want $slope")
    assert(got.getLong(3) == intercept, s"intercept ${got.getLong(3)}")
    // the trend line must land inside the observed revenue envelope
    val revs = days.map(_._2)
    val mid = (BigInt(slope) * days(nD / 2)._1 + intercept) / 1000000
    assert(mid >= revs.min / 2 && mid <= revs.max * 2, s"line level $mid")
  }

  test("q_hll equals a naive register replay; ALL row is the register merge") {
    val rows = Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_custkey"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def regs(g: Seq[Long]): Array[Int] = {
      val m = Array.fill(64)(0)
      for (k <- g) {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"hll#$k".getBytes("UTF-8")).map(x => f"$x%02x").mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 12), 16)
        val reg = (h % 64).toInt
        val rest = h / 64
        val rho = if (rest == 0) 43 else 43 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
        m(reg) = math.max(m(reg), rho)
      }
      m
    }
    def est(m: Array[Int]): (Long, Long, Long) = {
      val s = m.map(mj => 1L << (43 - mj)).sum
      val vZero = m.count(_ == 0)
      (vZero.toLong, s, (Relational.HllNum / (1000 * BigInt(s))).toLong)
    }
    val got = Relational.queries("q_hll")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getInt(1).toLong, r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val byGrp = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got.keySet == byGrp.keySet + "ALL")
    val grpRegs = byGrp.view.mapValues(g => regs(g)).toMap
    for ((grp, m) <- grpRegs + ("ALL" ->
        grpRegs.values.reduce((a, b) =>
          a.toSeq.zip(b.toSeq).map(p => math.max(p._1, p._2)).toArray))) {
      val (vZero, s, e) = est(m)
      val exact = (if (grp == "ALL") rows.map(_._2).toSeq else byGrp(grp)).distinct.length
      val (gv, gs, ge, gx, gerr) = got(grp)
      assert((gv, gs, ge) == ((vZero, s, e)), s"$grp registers")
      assert(gx == exact, s"$grp exact")
      assert(gerr == 1000000L * math.abs(e - exact) / exact, s"$grp err")
      // m=64 keeps the raw estimate within ~3.5 sigma of truth here
      assert(gerr < 450000L, s"$grp err_ppm $gerr")
    }
  }
}
