package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.StreamingOps

/** Pack H query — a real Structured Streaming execution (file source →
  * watermark → windowed state → memory sink) whose bounded result equals
  * the batch SQL the oracle runs. */
object StreamingQueries {

  @volatile private var runId = 0

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_window_agg" -> ((s, dir) => {
      val name = synchronized { runId += 1; s"st_window_agg_$runId" }
      val out = StreamingOps.runToMemory(
        s, StreamingOps.windowAgg(StreamingOps.eventsStream(s, dir)), name)
      out.orderBy("wstart", "event_type")
    }),

    // Streaming dedup with watermark-bounded state: distinct
    // (user_id, hour) pairs emitted in append mode; the batch oracle is
    // a plain SELECT DISTINCT over the same projection.
    "st_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val name = synchronized { runId += 1; s"st_dedup_$runId" }
      val stream = StreamingOps.eventsStream(s, dir)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      val dd = StreamingOps.dedup(stream, Seq("user_id"), "h", "2 hours")
      StreamingOps.runToMemory(s, dd, name,
          org.apache.spark.sql.streaming.OutputMode.Append())
        .orderBy("user_id", "h")
    }),

    // Stream-stream interval join (purchase ↔ same-user error within
    // the prior hour); the batch oracle is the equivalent interval join.
    "st_join" -> ((s, dir) => {
      val name = synchronized { runId += 1; s"st_join_$runId" }
      val out = StreamingOps.runToMemory(s,
        StreamingOps.purchaseErrorJoin(StreamingOps.eventsStream(s, dir)), name,
        org.apache.spark.sql.streaming.OutputMode.Append())
      out.orderBy("p_id", "e_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "st_window_agg" ->
      """SELECT date_trunc('hour', ts) AS wstart, event_type,
           count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""",

    "st_dedup" ->
      """SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
         FROM events ORDER BY user_id, h""",

    "st_join" ->
      """SELECT p.event_id AS p_id, p.user_id, e.event_id AS e_id
         FROM events p JOIN events e
         ON p.event_type = 'purchase' AND e.event_type = 'error'
           AND e.user_id = p.user_id
           AND e.ts >= p.ts - INTERVAL 1 HOUR AND e.ts < p.ts
         ORDER BY p_id, e_id"""
  )
}
