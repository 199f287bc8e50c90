package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.BoundedPercentile
import graft.operators.BoundedPercentile.Spec

/** Unit coverage for the two-pass bounded-histogram exact-quantile
  * kernel — previously covered only indirectly through five oracle
  * queries. The reference implementation below is the definitional
  * sort-based interpolated order statistic (Spark `percentile` ==
  * DuckDB `quantile_cont`): h = (n−1)·p over the sorted multiset,
  * result = v⌊h⌋ + (h−⌊h⌋)·(v⌊h⌋₊₁ − v⌊h⌋), rounded to 4 decimals —
  * computed in exact BigInt arithmetic so the test oracle can't
  * itself wobble. Edge cases the oracle queries never reach: n=1
  * groups, p=0 and p=1, lo/hi ranks straddling a bucket boundary,
  * width=1 (every value its own bucket), negative values WITHOUT an
  * offset (documented-exact: bucket 0 spans (−width, width)), and
  * randomized multisets with duplicates across several widths. */
class BoundedPercentileSpec extends SparkSpec {

  /** Definitional quantile over the sorted multiset, round-4. */
  private def naive(vs: Seq[Long], num: Int, den: Int): Double = {
    val s = vs.sorted
    val n = s.length
    val h = BigInt(n - 1) * num
    val lo = (h / den).toInt
    val rem = (h % den).toLong
    val hiIdx = math.min(lo + 1, n - 1)
    val scaled = BigInt(s(lo)) * den + BigInt(s(hiIdx) - s(lo)) * rem
    val v = scaled.toDouble / den
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def df(vs: Seq[Long]): DataFrame = {
    import spark.implicits._
    vs.toDF("v")
  }

  private def run(vs: Seq[Long], specs: Seq[Spec], width: Long,
      offset: Long = 0L): Map[String, Double] = {
    val row = BoundedPercentile.fences(df(vs), Seq.empty, "v", specs, width,
        offset = offset, scope = "test")
      .collect().head
    val out = specs.map(sp => sp.name -> row.getAs[Double](sp.name)).toMap
    CacheBook.release(spark, "test")
    out
  }

  private def check(vs: Seq[Long], specs: Seq[Spec], width: Long,
      offset: Long = 0L): Unit = {
    val got = run(vs, specs, width, offset)
    specs.foreach { sp =>
      val want = naive(vs, sp.num, sp.den)
      assert(got(sp.name) == want,
        s"${sp.name}=${sp.num}/${sp.den} over n=${vs.size} width=$width " +
          s"offset=$offset: got ${got(sp.name)}, want $want")
    }
  }

  private val quartiles = Seq(Spec("q1", 1, 4), Spec("med", 1, 2), Spec("q3", 3, 4))

  test("n=1 group: every percentile is the single value") {
    check(Seq(42L), Seq(Spec("p0", 0, 1), Spec("med", 1, 2), Spec("p1", 1, 1),
      Spec("p37", 37, 100)), width = 16)
  }

  test("p=0 and p=1 are exact min / max (no hi-rank overrun at n)") {
    check(Seq(5L, 9L, 1L, 7L, 3L), Seq(Spec("p0", 0, 1), Spec("p1", 1, 1)),
      width = 4)
  }

  test("lo/hi ranks straddling a bucket boundary interpolate across buckets") {
    // width 4 → buckets [0,4) [4,8): with values 3 and 4 the median
    // ranks are 1 (bucket 0) and 2 (bucket 1) — the cross-bucket case
    check(Seq(3L, 4L), Seq(Spec("med", 1, 2)), width = 4)
    // and a wider straddle with duplicates piled at the boundary
    check(Seq(2L, 3L, 3L, 4L, 4L, 4L, 5L, 8L), quartiles, width = 4)
  }

  test("width=1 degenerates to one bucket per value and stays exact") {
    check(Seq(10L, 20L, 20L, 30L, 50L), quartiles, width = 1)
  }

  test("negative values WITHOUT offset are exact (double-width bucket 0)") {
    check(Seq(-7L, -3L, -1L, 0L, 2L, 5L), quartiles, width = 4)
    check(Seq(-100L, -50L, 25L), Seq(Spec("med", 1, 2)), width = 8)
  }

  test("offset shifts the domain and is subtracted back exactly") {
    check(Seq(-1000000L, -999999L, -500000L, 0L, 999999L),
      Seq(Spec("p05", 1, 20), Spec("med", 1, 2)), width = 1L << 12,
      offset = 1000000L)
  }

  test("keyed groups compute independent percentiles per key") {
    import spark.implicits._
    val rows = Seq(("a", 1L), ("a", 3L), ("a", 100L), ("b", 7L),
      ("b", -7L), ("c", 9L))
    val got = BoundedPercentile.fences(rows.toDF("k", "v"), Seq("k"), "v",
        Seq(Spec("med", 1, 2)), width = 8, countCol = Some("n"),
        scope = "test")
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n"), r.getAs[Double]("med"))).toMap
    CacheBook.release(spark, "test")
    assert(got("a") == ((3L, naive(Seq(1L, 3L, 100L), 1, 2))))
    assert(got("b") == ((2L, naive(Seq(7L, -7L), 1, 2))))
    assert(got("c") == ((1L, 9.0)))
  }

  test("randomized multisets match the definitional quantile across widths") {
    val rng = new scala.util.Random(0xb0d5ed)
    val specs = Seq(Spec("p0", 0, 1), Spec("p05", 1, 20), quartiles(0),
      quartiles(1), quartiles(2), Spec("p90", 9, 10), Spec("p99", 99, 100),
      Spec("p1", 1, 1))
    for (trial <- 1 to 4) {
      val n = 1 + rng.nextInt(200)
      // duplicates on purpose (small value range), signed domain
      val vs = Seq.fill(n)((rng.nextInt(2001) - 1000).toLong)
      for (width <- Seq(3L, 16L, 1L << 10))
        check(vs, specs, width)
    }
  }

  test("fencesBy with per-key widths == one fences call per metric (q_rfm fuse)") {
    import spark.implicits._
    val rng = new scala.util.Random(0xfe4ce5)
    val n = 150
    // three metrics with very different domains, q_rfm-shaped
    val rows = (1 to n).map(_ => (rng.nextInt(365).toLong,
      (1 + rng.nextInt(40)).toLong, (rng.nextInt(2000000) + 100).toLong))
    val per = rows.toDF("rec", "fr", "mc")
    val widths = Map("r" -> 32L, "f" -> 8L, "m" -> (1L << 16))
    val specs = (1 to 4).map(k => Spec(s"p$k", k, 5))
    // the fused keyed pass, per-metric widths via the key expression
    val melted = per.select(explode(array(
        struct(lit("r").as("met"), col("rec").as("v")),
        struct(lit("f").as("met"), col("fr").as("v")),
        struct(lit("m").as("met"), col("mc").as("v")))).as("t"))
      .select(col("t.met").as("met"), col("t.v").as("v"))
    val widthOf = when(col("met") === "r", lit(widths("r")))
      .when(col("met") === "f", lit(widths("f")))
      .otherwise(lit(widths("m")))
    val fused = BoundedPercentile.fencesBy(melted, Seq("met"), "v", specs,
        widthOf, scope = "test")
      .collect().map(r => r.getAs[String]("met") ->
        specs.map(sp => r.getAs[Double](sp.name))).toMap
    // the reference: one independent global fences call per metric
    val split = Map(
      "r" -> rows.map(_._1), "f" -> rows.map(_._2), "m" -> rows.map(_._3))
      .map { case (m, vs) =>
        val row = BoundedPercentile.fences(vs.toDF("v"), Seq.empty, "v",
          specs, widths(m), scope = "test").collect().head
        m -> specs.map(sp => row.getAs[Double](sp.name))
      }
    CacheBook.release(spark, "test")
    assert(fused == split,
      s"fused keyed fences diverged from per-metric fences:\n$fused\n$split")
  }
}
