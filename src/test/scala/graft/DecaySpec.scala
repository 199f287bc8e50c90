package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.queries.Relational

/** q_decay teeth: the integer decay weights must equal the definition
  * — weight 2^(15 - min(age div halflife, 15)) over floor-micro values
  * — including the two edges the gate corpus may not pin: an event
  * EXACTLY on a bucket boundary (belongs to the older bucket: div is
  * floor for the non-negative age) and ages past 15 half-lives
  * (clamped, not zeroed or wrapped). */
class DecaySpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L // µs

  test("decay weights: boundary buckets, clamp, exact integer sums") {
    val t0 = 1700000000000000L // µs epoch, the newest event ("now")
    def ts(us: Long) = new Timestamp(us / 1000)
    // user 1: now, half-a-day old, EXACTLY one day old, one day minus
    // one µs; user 2: 15 and 40 half-lives old (both clamp to 2^0)
    val rows = Seq(
      (1L, ts(t0), 1L, "view", 1.000001, "{}"),
      (2L, ts(t0 - Day / 2), 1L, "view", 2.0, "{}"),
      (3L, ts(t0 - Day), 1L, "view", 4.0, "{}"),
      (4L, ts(t0 - Day + 1000), 1L, "view", 8.0, "{}"),
      (5L, ts(t0 - 15 * Day), 2L, "view", 1.0, "{}"),
      (6L, ts(t0 - 40 * Day), 2L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = Files.createTempDirectory("decay").toString
    rows.write.parquet(s"$dir/events.parquet")

    val got = Relational.queries("q_decay")(spark, dir)
      .as[(Long, Long, Long)].collect()
      .map { case (u, n, s) => u -> ((n, s)) }.toMap

    // user 1: buckets 0, 0, 1, 0 (the boundary event is one day old;
    // one ms younger stays in bucket 0)
    val w15 = 1L << 15
    // 1.000001 as a double sits just below 1.000001 → floors to 1000000
    val u1 = 1000000L * w15 + 2000000L * w15 + 4000000L * (1L << 14) +
      8000000L * w15
    // user 2: bucket 15 exactly and clamped-at-15 → both weight 2^0
    val u2 = 1000000L * 1L + 3000000L * 1L
    assert(got(1L) == ((4L, u1)), got(1L).toString)
    assert(got(2L) == ((2L, u2)), got(2L).toString)
  }
}
