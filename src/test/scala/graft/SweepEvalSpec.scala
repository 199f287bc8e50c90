package graft

import graft.queries.{Relational, TextAnalysis}
import org.apache.spark.sql.functions._

/** Teeth for the funnel-window sweep and the language-ID eval beyond
  * their full oracles: q_funnel_sweep equals three naive bounded
  * funnels replayed in the JVM (monotone in the window, view row
  * constant), and x_langid_eval's confusion cells are exactly the
  * grouped per-doc predictions x_langid itself ships, conserving the
  * corpus with consistent row totals.
  */
class SweepEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_funnel_sweep equals three naive bounded funnels") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("et"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def funnel(w: Long): (Long, Long, Long) = {
      var (nv, nc, np) = (0L, 0L, 0L)
      for ((_, g) <- byUser) {
        val views = g.filter(_._2 == "view").map(_._3)
        if (views.nonEmpty) {
          nv += 1
          val t1 = views.min
          val clicks = g.filter(t => t._2 == "click" && t._3 > t1 && t._3 <= t1 + w)
            .map(_._3)
          if (clicks.nonEmpty) {
            nc += 1
            val t2 = clicks.min
            if (g.exists(t => t._2 == "purchase" && t._3 > t2 && t._3 <= t2 + w))
              np += 1
          }
        }
      }
      (nv, nc, np)
    }
    val got = Relational.queries("q_funnel_sweep")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val windows = Seq(3600000000L, 86400000000L, 604800000000L)
    assert(got.keySet == windows.toSet)
    for (w <- windows) assert(got(w) == funnel(w), s"window $w diverges")
    // conversion is monotone in the window; the view stage is constant
    assert(windows.map(got(_)._2) == windows.map(got(_)._2).sorted,
      "click conversions not monotone in window")
    assert(got.values.map(_._1).toSet.size == 1, "n_view varies by window")
  }

  test("x_langid_eval cells are exactly the grouped per-doc predictions") {
    val perDoc = TextAnalysis.queries("x_langid")(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val naive = perDoc.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = TextAnalysis.queries("x_langid_eval")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(t => (t._1, t._2) -> t._3).toMap == naive,
      "confusion cells diverge from the per-doc predictions")
    assert(rows.map(_._3).sum == perDoc.length.toLong, "cells lose documents")
    for ((lang, g) <- rows.groupBy(_._1)) {
      val tot = g.map(_._3).sum
      assert(g.forall(_._4 == tot), s"$lang row_total inconsistent")
      for (t <- g)
        assert(t._5 == 1000000L * t._3 / tot, s"$lang cell ppm drifts")
    }
  }
}
