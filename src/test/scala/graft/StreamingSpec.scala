package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{SessEvent, Session}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // base well above epoch: rows AT the initial watermark (epoch 0) are
  // dropped as late by stateful operators
  private def ts(minutes: Long): Timestamp =
    new Timestamp(1704067200000L + minutes * 60000L)

  test("streaming sessionization emits closed sessions, keeps open state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessEvent]
    val sessions = StreamingOps.sessionize(input.toDS(), gapSeconds = 1800)
    val q = sessions.writeStream.format("memory")
      .queryName("sess_test").outputMode(OutputMode.Append()).start()

    // session 1: two events 10 min apart; then a 2h gap closes it
    input.addData(SessEvent(1L, 1L, ts(0)), SessEvent(1L, 2L, ts(10)))
    q.processAllAvailable()
    input.addData(SessEvent(1L, 3L, ts(130)))
    q.processAllAvailable()
    // watermark must advance past session1.end + gap: add a later batch
    input.addData(SessEvent(2L, 4L, ts(600)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_test").as[Session].collect()
    val closed = out.find(s => s.user_id == 1L && s.session_idx == 1)
    assert(closed.isDefined, s"session 1 should have closed; got ${out.toSeq}")
    assert(closed.get.n_events == 2)
    assert(closed.get.session_start == ts(0) && closed.get.session_end == ts(10))
  }

  test("late events beyond the watermark are dropped, and the drop is " +
      "observable in progress metrics") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val agg = input.toDS().toDF("id", "ts")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append()).start()
    // batch 1: two on-time events in hour 0; one at 3:00 advances the
    // watermark (for the NEXT batch) to 2:00, finalizing hour 0
    input.addData((1L, ts(10)), (2L, ts(40)), (3L, ts(180)))
    q.processAllAvailable()
    // batch 2: an event for hour 0 arrives 90 minutes past the
    // watermark — it must be DROPPED, not merged into the already
    // emitted window; a second on-time event keeps hour 3 open
    input.addData((4L, ts(30)), (5L, ts(210)))
    q.processAllAvailable()
    val dropped = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .map(_.numRowsDroppedByWatermark).sum
    q.stop()
    val rows = spark.table("late_test").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    // exactly the finalized hour-0 window, with the on-time count only
    assert(rows == Map(ts(0) -> 2L),
      s"late row must not reopen or recount the emitted window: ${rows.toSeq}")
    assert(dropped == 1L,
      s"the drop must be observable (numRowsDroppedByWatermark), got $dropped")
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val df = input.toDS().toDF("id", "ts")
    val deduped = StreamingOps.dedup(df, Seq("id"), "ts", "1 hour")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_test").outputMode(OutputMode.Append()).start()

    input.addData((1L, ts(0)), (1L, ts(0)), (2L, ts(1)))
    q.processAllAvailable()
    input.addData((1L, ts(0)), (3L, ts(2))) // late duplicate of id=1
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_test").select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream-static ingest dedup finds dups batch-by-batch, stateless") {
    // new docs arriving in SEPARATE micro-batches must each probe the
    // standing index independently (the pipeline holds no per-doc
    // state; only emitted pairs are deduplicated)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different document about spark and shuffles here"),
      (3L, "numbers one two three four five six seven eight nine"))
    val standingDocs = corpus.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.queries.Dedup.shingleHashCol(col("text")).as("sh"))
    val standing = graft.queries.Dedup.streamBands(standingDocs)
      .select(col("doc_id").as("old_id"), col("bi"), col("bk"),
        col("sh").as("old_sh"))
    val input = MemoryStream[(Long, String)]
    val newDocs = input.toDS().toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.queries.Dedup.shingleHashCol(col("text")).as("sh"))
    val verified = graft.queries.Dedup.streamBands(newDocs)
      .join(standing, Seq("bi", "bk"))
      .filter(col("old_id") =!= col("doc_id"))
      .select(col("old_id").as("a"), col("doc_id").as("b"))
      .dropDuplicates("a", "b")
    val q = verified.writeStream.format("memory")
      .queryName("ingest_test").outputMode(OutputMode.Append()).start()
    // batch 1: near-copy of doc 1 (one word changed); batch 2: a
    // near-copy of doc 3 and an unrelated doc — found independently
    input.addData((10L, "the quick brown fox jumps over the lazy dog tonight"))
    q.processAllAvailable()
    input.addData((11L, "numbers one two three four five six seven eight ten"),
      (12L, "nothing in common with anything stored so far at all"))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("ingest_test").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 10L)), s"batch-1 dup missed: $pairs")
    assert(pairs.contains((3L, 11L)), s"batch-2 dup missed: $pairs")
    assert(!pairs.exists(_._2 == 12L), s"unrelated doc flagged: $pairs")
  }

  test("stream-stream left-outer join flushes null-padded rows at watermark close") {
    // the outer semantics st_join can't show: a purchase with no
    // prior-hour same-user error must STILL emit (e_id -1) — but only
    // once the watermark passes its join window. If the sentinel-flush
    // trick under-advances the watermark, exactly these rows go
    // missing; if sentinels leak, phantom rows appear.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.StreamingQueries.queries("st_left_join")(spark, dir)
    val batch = {
      val ev = Tables.load(spark, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val e = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
          col("ts").as("e_ts"))
      p.join(e, col("user_id") === col("e_user")
          && col("e_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("e_ts") < col("p_ts"), "leftOuter")
        .select(col("p_id"), col("user_id"),
          coalesce(col("e_id"), lit(-1L)).as("e_id"))
    }
    val streamed = out.as[(Long, Long, Long)].collect().toSet
    val expected = batch.as[(Long, Long, Long)].collect().toSet
    assert(streamed == expected,
      s"missing=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
    assert(streamed.exists(_._3 == -1L), "some purchase must be unmatched (null-padded)")
    assert(streamed.exists(_._3 != -1L), "some purchase must be matched")
  }

  test("windowed aggregation over a bounded stream equals batch") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.windowAgg(StreamingOps.eventsStream(spark, dir)), "wa_test")
    val batch = Tables.load(spark, dir, "events")
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour",
        org.apache.spark.sql.functions.col("ts")))
      .count()
    assert(streamed.select("wstart").distinct().count() == batch.count())
  }

  test("streaming ANN ingest lands the same cells as one-shot batch append") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", graft.functions.VecOps.norm(col("v")))
    val base = e.filter(col("vec_id") % 2 === 0)
    val incoming = e.filter(col("vec_id") % 2 === 1)
    // identical standing index at two paths: the hash-draw centroid set
    // over the base half plus its assigned cells
    val cents = base
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(8)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("n").as("cn"))
    val cells = graft.sources.AnnIndexStore.assign(base, cents)
    val pBatch = java.nio.file.Files.createTempDirectory("annB").toString
    val pStream = java.nio.file.Files.createTempDirectory("annS").toString
    graft.sources.AnnIndexStore.write(pBatch, cents, cells)
    graft.sources.AnnIndexStore.write(pStream, cents, cells)
    // nightly path: one batch append of the whole incoming half
    graft.sources.AnnIndexStore.append(spark, pBatch, incoming)
    // real-time path: the SAME vectors in three micro-batches
    val rows = incoming.select("vec_id", "v").as[(Long, Array[Double])].collect()
    val input = MemoryStream[(Long, Array[Double])]
    val stream = input.toDS().toDF("vec_id", "v")
      .withColumn("n", graft.functions.VecOps.norm(col("v")))
    val q = StreamingOps.annIngest(stream, pStream)
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    // streamed == nightly end-state: same (vec_id -> cid) assignment
    def cellsOf(p: String): Set[(Long, Long)] =
      graft.sources.AnnIndexStore.read(spark, p)._2
        .select("vec_id", "cid").as[(Long, Long)].collect().toSet
    val fromBatch = cellsOf(pBatch)
    val fromStream = cellsOf(pStream)
    assert(fromStream == fromBatch,
      s"diff=${(fromStream diff fromBatch).take(3)} / ${(fromBatch diff fromStream).take(3)}")
    // and the index actually grew by the incoming half
    assert(fromBatch.size == base.count() + incoming.count())
  }

  test("streaming incremental rollup in 3 micro-batches equals the one-shot aggregate") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 90L).map(i => (i % 11, (i * 31 % 100).toDouble))
    val input = MemoryStream[(Long, Double)]
    val stream = input.toDS().toDF("k", "v")
    val acc = new StreamingOps.IncAggState(Seq("k"), col("v"))
    val q = StreamingOps.ingest(stream, acc)
    rows.grouped(30).foreach { chunk =>
      input.addData(chunk)
      q.processAllAvailable() // one micro-batch per chunk
    }
    q.stop()
    val got = acc.current(spark, stream.schema)
      .select("k", "n", "total", "lo", "hi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2), r.getDouble(3),
        r.getDouble(4))).toSet
    val want = graft.operators.IncrementalAgg
      .state(rows.toDF("k", "v"), Seq("k"), col("v"))
      .select("k", "n", "total", "lo", "hi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2), r.getDouble(3),
        r.getDouble(4))).toSet
    acc.release()
    assert(got == want)
  }

  test("streaming HLL registers in 3 micro-batches equal the one-shot sketch") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // registers are max-merge state: ANY chunking must land identically
    val rows = (1L to 90L).map(i => (s"${i % 3}-P", i * 7 % 40))
    val input = MemoryStream[(String, Long)]
    val stream = input.toDS().toDF("o_orderpriority", "o_custkey")
    val acc = new StreamingOps.IncAggState(Seq("grp", "reg"), col("rho"))
    val obs = graft.queries.Relational.hllRows(stream)
    val q = StreamingOps.ingest(obs, acc)
    rows.grouped(30).foreach { chunk =>
      input.addData(chunk)
      q.processAllAvailable() // one micro-batch per chunk
    }
    q.stop()
    val got = acc.current(spark, obs.schema)
      .select(col("grp"), col("reg"), col("hi").cast("int").as("mj"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val want = graft.queries.Relational
      .hllRows(rows.toDF("o_orderpriority", "o_custkey"))
      .groupBy("grp", "reg").agg(max("rho").as("mj"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    acc.release()
    assert(got == want && got.nonEmpty)
  }

  test("CDC upsert in shuffled micro-batches equals the one-shot argmax") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // several versions per key; version order (v, id) is TOTAL so
    // delivery order must not matter — deliver deliberately scrambled
    val rows = (1L to 60L).map(i => (i, i % 7, (i * 13 % 20), s"p$i"))
    val scrambled = rows.sortBy(r => (r._1 * 7919) % 97)
    val input = MemoryStream[(Long, Long, Long, String)]
    val stream = input.toDS().toDF("id", "k", "v", "payload")
    val acc = new StreamingOps.CdcState(Seq("k"),
      Seq(col("v").desc, col("id").desc))
    val q = StreamingOps.ingest(stream, acc)
    scrambled.grouped(20).foreach { chunk =>
      input.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val got = acc.current(spark, stream.schema).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val want = rows.groupBy(_._2).values
      .map(g => g.maxBy(r => (r._3, r._1))).toSet
    acc.release()
    assert(got == want)
  }
}
