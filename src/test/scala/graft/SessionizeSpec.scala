package graft

import org.apache.spark.sql.functions._
import graft.streaming.Sessionize

class SessionizeSpec extends SparkSpec {

  test("batch sessionization: gap splits, aggregates per session") {
    val s = spark
    import s.implicits._
    val base = 1700000000000000L // µs
    val min = 60L * 1000000
    val rows = Seq(
      (1L, 1L, base, 1.0), (2L, 1L, base + 5 * min, 2.0),   // session 1 (gap 5m)
      (3L, 1L, base + 60 * min, 4.0),                       // session 2 (gap 55m)
      (4L, 2L, base, 8.0))                                  // other user
      .map { case (eid, uid, us, v) => (eid, uid, new java.sql.Timestamp(us / 1000), v) }
      .toDF("event_id", "user_id", "ts", "value")
    val out = Sessionize.sessionizeBatch(rows).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
    assert(out.toSeq == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 8.0)))
  }

  test("stateful sessionization emits closed sessions; open ones stay in state") {
    // one micro-batch of the static events file: every session except each
    // user's last (still open) must be emitted, matching the batch answer
    val events = Tables.events(spark, sf0001)
    val q = Sessionize.sessionizeStateful(
      graft.streaming.Streams.readEvents(spark, sf0001))
      .writeStream.outputMode("append").format("memory")
      .queryName("sessionize_spec_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessionize_spec_out")
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(_.toSeq).toSet

    val batch = Sessionize.sessionizeBatch(events)
    val lastPerUser = batch.groupBy("user_id").agg(max("session_id").as("session_id"))
    val closed = batch.join(lastPerUser, Seq("user_id", "session_id"), "left_anti")
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(_.toSeq).toSet
    assert(streamed == closed)
    assert(streamed.nonEmpty)
  }

  test("stateful sessionization: bounded out-of-order merges, far-late emits standalone") {
    val s = spark
    import s.implicits._
    val base = 1700000000000000L // µs
    val min = 60L * 1000000
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)](s)
    val df = mem.toDF().toDF("user_id", "usv", "value")
      .withColumn("ts", timestamp_micros(col("usv"))).drop("usv")
    val q = Sessionize.sessionizeStateful(df)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_ooo_out").start()
    // batch 1: open session [base, base+10m]
    mem.addData((1L, base, 1.0), (1L, base + 10 * min, 2.0))
    q.processAllAvailable()
    // batch 2: out-of-order event inside the session bounds (merges), plus
    // one >gap older than session start (emitted standalone)
    mem.addData((1L, base + 5 * min, 4.0), (1L, base - 60 * min, 8.0))
    q.processAllAvailable()
    // batch 3: gap closes the session -> emitted with merged aggregates
    mem.addData((1L, base + 60 * min, 16.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_ooo_out")
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(rows == Set(
      Seq(1L, base - 60 * min, base - 60 * min, 1L, 8.0),  // far-late standalone
      Seq(1L, base, base + 10 * min, 3L, 7.0)))            // merged session
  }

  test("stateful sessionization with event-time timeout flushes final open sessions") {
    val s = spark
    import s.implicits._
    val base = 1700000000000000L // µs
    val min = 60L * 1000000
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)](s)
    val df = mem.toDF().toDF("user_id", "usv", "value")
      .withColumn("ts", timestamp_micros(col("usv"))).drop("usv")
      .withWatermark("ts", "0 seconds")
    val q = Sessionize.sessionizeStateful(df, eventTimeTimeout = true)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_timeout_out").start()
    mem.addData((1L, base, 1.0), (1L, base + 5 * min, 2.0))
    q.processAllAvailable()
    // another user's much-later event advances the watermark...
    mem.addData((2L, base + 120 * min, 4.0))
    q.processAllAvailable()
    // ...and the next batch evaluates timeouts against it
    mem.addData((2L, base + 121 * min, 8.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_timeout_out")
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(_.toSeq).toSet
    // user 1's open session [base, base+5m] flushed by timeout (watermark
    // base+120m > base+5m+30m gap)
    assert(rows.contains(Seq(1L, base, base + 5 * min, 2L)))
  }

  test("event-time timeout: engine drops events behind the watermark; query survives") {
    val s = spark
    import s.implicits._
    val base = 1700000000000000L // µs
    val min = 60L * 1000000
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)](s)
    val df = mem.toDF().toDF("user_id", "usv", "value")
      .withColumn("ts", timestamp_micros(col("usv"))).drop("usv")
      .withWatermark("ts", "0 seconds")
    val q = Sessionize.sessionizeStateful(df, eventTimeTimeout = true)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_late_wm_out").start()
    // advance the watermark far ahead with user 2
    mem.addData((2L, base + 300 * min, 1.0))
    q.processAllAvailable()
    // user 1's only event is far behind the watermark: in EventTimeTimeout
    // mode the ENGINE filters late rows before the stateful operator, so
    // no state is created and the query must keep running
    mem.addData((1L, base, 2.0))
    q.processAllAvailable()
    mem.addData((2L, base + 400 * min, 4.0))
    q.processAllAvailable()
    mem.addData((2L, base + 500 * min, 8.0))
    q.processAllAvailable()
    assert(q.exception.isEmpty, q.exception.toString)
    q.stop()
    val rows = spark.table("sess_late_wm_out")
      .select("user_id", "session_start_us", "n_events")
      .collect().map(_.toSeq).toSet
    // the dropped event produced nothing for user 1; user 2's gap-closed
    // sessions are all that exist
    assert(!rows.exists(_.head == 1L), rows.toString)
    assert(rows.nonEmpty)
  }
}
