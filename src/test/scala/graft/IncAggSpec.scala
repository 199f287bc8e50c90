package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

/** Incremental aggregate maintenance: merged partial states must equal
  * the from-scratch aggregate for ANY split of the input, and merges
  * must chain (nightly batches) — the algebra that lets a standing
  * rollup absorb deltas without rescanning the base facts. */
class IncAggSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 400L).map { i =>
    (i % 37, (i * 7919 % 1000).toDouble + 0.25, i)
  }.toSeq

  private def df(s: Seq[(Long, Double, Long)]) = s.toDF("k", "v", "seq")

  private def canon(r: Row): (Long, Long, java.math.BigDecimal, Double, Double) =
    (r.getLong(0), r.getLong(1), r.getDecimal(2), r.getDouble(3), r.getDouble(4))

  private def collectState(d: org.apache.spark.sql.DataFrame) =
    d.select("k", "n", "total", "lo", "hi").collect().map(canon).toSet

  test("merge(state(base), state(delta)) == state(full) for any cutoff") {
    val full = collectState(IncrementalAgg.state(df(rows), Seq("k"), col("v")))
    for (cut <- Seq(1L, 57L, 200L, 399L)) {
      val base = IncrementalAgg.state(df(rows.filter(_._3 <= cut)), Seq("k"), col("v"))
      val delta = IncrementalAgg.state(df(rows.filter(_._3 > cut)), Seq("k"), col("v"))
      val merged = collectState(IncrementalAgg.merge(Seq("k"), base, delta))
      assert(merged == full, s"cutoff $cut diverged")
    }
  }

  test("three-night chained merge equals scratch (associative batching)") {
    val full = collectState(IncrementalAgg.state(df(rows), Seq("k"), col("v")))
    val parts = Seq(rows.filter(_._3 <= 150), rows.filter(r => r._3 > 150 && r._3 <= 260),
      rows.filter(_._3 > 260)).map(p => IncrementalAgg.state(df(p), Seq("k"), col("v")))
    // nightly chain: ((s1 ⊕ s2) ⊕ s3)
    val chained = collectState(
      IncrementalAgg.merge(Seq("k"),
        IncrementalAgg.merge(Seq("k"), parts(0), parts(1)), parts(2)))
    assert(chained == full)
    // one-shot merge of all three batches
    val oneShot = collectState(IncrementalAgg.merge(Seq("k"), parts: _*))
    assert(oneShot == full)
  }

  test("merged state is itself valid state (keys absent from one side)") {
    // delta introduces keys the base never saw and vice versa
    val base = IncrementalAgg.state(df(rows.filter(_._1 < 20)), Seq("k"), col("v"))
    val delta = IncrementalAgg.state(df(rows.filter(_._1 >= 20)), Seq("k"), col("v"))
    val merged = collectState(IncrementalAgg.merge(Seq("k"), base, delta))
    val full = collectState(IncrementalAgg.state(df(rows), Seq("k"), col("v")))
    assert(merged == full)
  }
}
