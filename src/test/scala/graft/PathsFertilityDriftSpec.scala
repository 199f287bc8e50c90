package graft

import graft.queries.{Relational, Similarity, TextAnalysis}

/** Teeth for q_paths / x_fertility / s_embed_drift beyond the full
  * oracles: paths are real session prefixes that conserve sessions,
  * fertility conserves the corpus word mass and never drops below one
  * token per word, and the drift readout conserves vectors per label
  * with its top dimension bounded by the L1 total.
  */
class PathsFertilityDriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_paths returns a sorted top-20 of bounded session prefixes") {
    val rows = Relational.queries("q_paths")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 20)
    assert(rows.forall(_._1.nonEmpty), "empty path")
    assert(rows.forall(_._1.split(">", -1).length <= 5), "path longer than 5 steps")
    assert(rows.forall(r => r._1.split(">", -1).forall(_.nonEmpty)),
      "empty path segment — the NULL-skip contract broke")
    // sorted by count desc with path tiebreak
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1),
        s"ordering violated at $a -> $b")
    }
    // the top-20 cannot exceed the total session count
    val nSessions = graft.operators.Sessionize(
        Tables.load(spark, dir, "events"), "user_id", "ts", "event_id", 1800)
      .select("user_id", "session_idx").distinct().count()
    assert(rows.map(_._2).sum <= nSessions)
  }

  test("x_fertility conserves word mass at >= one token per word") {
    val rows = TextAnalysis.queries("x_fertility")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val corpusWords = Tables.load(spark, dir, "documents")
      .selectExpr("size(filter(split(text, ' '), w -> length(w) > 0)) AS nw")
      .agg(org.apache.spark.sql.functions.sum("nw")).collect()(0).getLong(0)
    assert(rows.map(_._2).sum == corpusWords, "per-lang words lose the corpus")
    assert(rows.forall(r => r._4 >= 1000000L),
      "fertility below one token per word")
    assert(rows.forall(r => r._3 >= r._2), "fewer tokens than words")
    assert(rows.forall(r => r._5 > 0L), "non-positive chars per token")
  }

  test("x_quality_calib conserves docs into sane bands") {
    val rows = TextAnalysis.queries("x_quality_calib")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables.load(spark, dir, "documents").count()
    assert(rows.map(_._2).sum == nDocs, "bands lose documents")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 10), "band out of range")
    assert(rows.forall(r => r._3 <= r._2), "more kept than present")
    assert(rows.forall(r => r._4 >= 0L && r._4 <= 1000000L),
      "keep rate outside [0, 1]")
    assert(rows.exists(_._4 > 0L) && rows.exists(_._4 < 1000000L),
      "calibration curve is degenerate (all-keep or all-drop)")
  }

  test("s_embed_drift conserves vectors per label, top dim bounded by L1") {
    val rows = Similarity.queries("s_embed_drift")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5)))
    val perLabel = Tables.load(spark, dir, "embeddings")
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet == perLabel.keySet, "labels missing")
    for ((lbl, n0, n1, l1, topDim, topD) <- rows) {
      assert(n0 + n1 == perLabel(lbl), s"label $lbl loses vectors")
      assert(n0 > 0 && n1 > 0, s"label $lbl: a half is empty")
      assert(topD <= l1, s"label $lbl: top dim exceeds the L1 total")
      assert(topDim >= 0 && topDim < 64, s"label $lbl: dim $topDim out of range")
      assert(l1 >= 0L)
    }
  }
}
