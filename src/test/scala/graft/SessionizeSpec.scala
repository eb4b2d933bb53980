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
}
