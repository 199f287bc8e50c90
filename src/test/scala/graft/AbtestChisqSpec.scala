package graft

import graft.queries.{Relational, Similarity}
import graft.functions.Determinism

/** Teeth for the experiment/drift/binning/novelty quartet beyond the
  * full oracles: q_abtest's integer moments equal a naive in-JVM
  * recomputation (arms, counts, floor-division means), q_chisq's
  * statistic is the sum of its own cells and conserves the corpus,
  * q_equidepth's bins conserve rows and stay roughly even with
  * monotone ranges, and s_knn_outlier flags a small-but-nonzero tail
  * — a threshold bug that flags everything (or nothing) dies here,
  * not at 100 TB.
  */
class AbtestChisqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_abtest moments equal a naive recomputation") {
    val cents = Tables.load(spark, dir, "events")
      .filter("event_type = 'purchase'")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(floor(sum(CAST(value AS DECIMAL(18,2))) * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byArm = cents.groupBy { case (uid, _) =>
      (Determinism.jvmMd5Idx(s"ab#$uid") % 2).toInt
    }
    val r = Relational.queries("q_abtest")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val (n0, n1) = (row.getLong(0), row.getLong(1))
    assert(n0 == byArm.getOrElse(0, Array.empty[(Long, Long)]).length.toLong)
    assert(n1 == byArm.getOrElse(1, Array.empty[(Long, Long)]).length.toLong)
    assert(n0 + n1 == cents.length.toLong, "arms lose users")
    val s0 = byArm(0).map(_._2).sum
    val s1 = byArm(1).map(_._2).sum
    assert(row.getLong(2) == s0 && row.getLong(3) == s1, "arm sums diverge")
    // floor-division means, re-derived with BigInt like the query's decimals
    assert(row.getLong(4) == (BigInt(1000000) * s0 / n0).toLong)
    assert(row.getLong(5) == (BigInt(1000000) * s1 / n1).toLong)
    assert(row.getLong(6) >= 0L && row.getLong(7) >= 0L, "negative variance")
    assert(row.getLong(9) >= 0L, "negative z²")
  }

  test("q_chisq cells sum to the statistic and conserve the corpus") {
    val rows = Relational.queries("q_chisq")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val nDocs = Tables.load(spark, dir, "documents").count()
    assert(rows.map(_._3).sum == nDocs, "cells lose documents")
    assert(rows.forall(_._5 >= 0L), "negative contribution")
    val chi2 = rows.head._6
    assert(rows.forall(_._6 == chi2), "chi2 differs across cells")
    assert(rows.map(_._5).sum == chi2, "chi2 is not the sum of its cells")
    // expected counts also conserve the corpus up to floor loss
    val expSum = rows.map(_._4).sum
    assert(expSum <= 1000000L * nDocs && expSum > 1000000L * (nDocs - rows.length),
      s"expected-count mass $expSum drifts from ${1000000L * nDocs}")
  }

  test("q_equidepth conserves rows into 10 roughly-even monotone bins") {
    val rows = Relational.queries("q_equidepth")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 10), "bins missing or extra")
    val nOrders = Tables.load(spark, dir, "orders").count()
    assert(rows.map(_._2).sum == nOrders, "bins lose rows")
    val depths = rows.map(_._2)
    assert(depths.max < 3 * depths.min,
      s"equi-depth bins are skewed: ${depths.mkString(",")}")
    // ranges are monotone and non-overlapping
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bin ${a._1} max ${a._4} overlaps bin ${b._1} min ${b._3}")
    }
  }

  test("s_knn_outlier flags a small nonzero tail over every graph node") {
    val rows = Similarity.queries("s_knn_outlier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate nodes")
    assert(rows.forall(r => r._3 >= -1000000L && r._3 <= 1000000L),
      "kth-neighbor cosine outside [-1, 1]")
    val flagged = rows.count(_._4)
    assert(flagged > 0, "threshold flags nothing")
    assert(flagged <= rows.length / 5,
      s"threshold flags $flagged of ${rows.length} — the 5th percentile leaks")
    // the flagged tail is exactly the low end of the score distribution
    val worstKept = rows.filter(!_._4).map(_._3).min
    val bestFlagged = rows.filter(_._4).map(_._3).max
    assert(bestFlagged <= worstKept, "flagged set is not the low tail")
  }
}
