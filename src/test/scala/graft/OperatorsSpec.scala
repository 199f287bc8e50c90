package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Sessionize}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("as-of join picks the latest strictly-prior right row") {
    val left = Seq((1L, 100L, ts(10)), (1L, 101L, ts(20)), (2L, 102L, ts(5)))
      .toDF("user_id", "event_id", "ts")
    val right = Seq((1L, 50L, ts(8)), (1L, 51L, ts(10)), (1L, 52L, ts(15)))
      .toDF("user_id", "event_id", "ts")
    val out = AsOfJoin(left, right, Seq("user_id"), "ts",
      rightVals = Seq("event_id"), tiebreak = "event_id")
      .select("event_id", "prior_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L).contains(50L), "equal-time right row (51 @ t10) must NOT match")
    assert(out(101L).contains(52L))
    assert(out(102L).isEmpty, "no prior right row for user 2")
  }

  test("as-of join tolerance nulls out matches older than the window") {
    val left = Seq((1L, 100L, ts(60))).toDF("user_id", "event_id", "ts")
    val right = Seq((1L, 50L, ts(10))).toDF("user_id", "event_id", "ts")
    def run(tol: Option[Long]) =
      AsOfJoin(left, right, Seq("user_id"), "ts", Seq("event_id"), "event_id",
        toleranceSeconds = tol)
        .select("prior_event_id").as[Option[Long]].head()
    assert(run(None).contains(50L))
    assert(run(Some(3600L)).contains(50L), "50-min lookback within 1h tolerance")
    assert(run(Some(600L)).isEmpty, "50-min lookback outside 10-min tolerance")
  }

  test("sessionize splits on gaps greater than the timeout") {
    val df = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(20)), (1L, 3L, ts(60)), (2L, 4L, ts(0)))
      .toDF("user_id", "event_id", "ts")
    val out = Sessionize(df, "user_id", "ts", "event_id", gapSeconds = 1800)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1 && out(2L) == 1, "20-min gap stays in session")
    assert(out(3L) == 2, "40-min gap opens a new session")
    assert(out(4L) == 1)
  }

  test("boundedBlocks splits oversized blocks and is a no-op under the cap") {
    // one (lang, lb) block of 120 docs; cap=40 -> 3 hash-assigned
    // sub-blocks (hashed, not doc_id % n, so id patterns can't defeat
    // the split — the bound is then probabilistic, ~cap per sub-block)
    val sh = (0L until 120L).map(i => (i, "en", 1L)).toDF("doc_id", "lang", "lb")
    val sub = graft.queries.Dedup.boundedBlocks(sh, cap = 40)
      .groupBy("lang", "lb", "sub").count()
      .select("count").as[Long].collect()
    assert(sub.length == 3, "ceil(120/40) = 3 sub-blocks")
    assert(sub.sum == 120, "every doc keeps exactly one sub-block")
    assert(sub.max <= 80, "hash split keeps sub-blocks near the cap")
    // under the cap: every doc lands in sub-block 0 (results unchanged)
    val noop = graft.queries.Dedup.boundedBlocks(sh, cap = 2000)
      .select("sub").as[Long].collect()
    assert(noop.forall(_ == 0L))
  }

  test("alphanum custom expression works under whole-stage codegen") {
    val out = Seq.tabulate(100)(i => s"User$i-secret$i").toDF("v")
      .select(graft.functions.Transforms.alphanum(col("v")).as("r"))
      .as[String].collect()
    assert(out.distinct.length == 100, "distinct inputs scramble to distinct outputs")
    assert(out.forall(_.contains("-")), "punctuation preserved")
  }
}
