package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — batch (window functions) and incremental
  * (`flatMapGroupsWithState`) forms of the same semantics: a session is a
  * maximal run of a user's events with inter-event gap <= `gapUs`.
  *
  * Batch: two window passes over (user_id, ts) — lag to mark boundaries,
  * running sum to number sessions — then one aggregation. Shuffles once
  * on user_id; at 100 TB the sort is per-user-partition, never global.
  *
  * Streaming: per-user GroupState holds only the open session (O(users)
  * state); closed sessions emit as soon as the closing gap is observed.
  */
object Sessionize {

  case class Ev(user_id: Long, us: Long, value: Double)
  case class SessState(startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start_us: Long, session_end_us: Long,
                     n_events: Long, sum_value: Double)

  val DefaultGapUs: Long = 30L * 60 * 1000 * 1000 // 30 minutes

  /** Batch sessionization with per-session aggregates. */
  def sessionizeBatch(events: DataFrame, gapUs: Long = DefaultGapUs): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(
        min(col("us")).as("session_start_us"),
        max(col("us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** Incremental sessionization: emits each session when the gap that
    * closes it is observed; the open session per user stays in state.
    *
    * Ordering contract: events are sorted by event time WITHIN each
    * micro-batch; exact [[sessionizeBatch]] parity additionally requires
    * in-order arrival ACROSS batches. Bounded cross-batch disorder is
    * tolerated: an event older than the open session's end but no older
    * than `session_start - gap` merges into the session (extending its
    * bounds); an event older than that reorder budget is emitted
    * immediately as its own single-event session rather than corrupting
    * the open one.
    *
    * With `eventTimeTimeout = true` (requires a watermark on `ts`), each
    * user's final open session is flushed once the watermark passes
    * `session_end + gap` — without it, `NoTimeout` means the last session
    * per user is never emitted (state outlives the query). Note the mode
    * trade-off: in EventTimeTimeout mode the ENGINE drops events behind
    * the watermark before they reach this operator (standard Structured
    * Streaming late-data filtering), so the bounded-disorder merge below
    * only sees events inside the watermark budget; NoTimeout mode sees
    * everything and handles arbitrary lateness itself. */
  def sessionizeStateful(events: DataFrame, gapUs: Long = DefaultGapUs,
                         eventTimeTimeout: Boolean = false): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (eventTimeTimeout) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      // keep `ts` alongside the µs projection: it carries the watermark
      // tag, which must reach the stateful operator for EventTimeTimeout
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, s.startUs, s.lastUs, s.n, s.sum))
          } else {
            val evs = it.toIndexedSeq.sortBy(_.us)
            val out = ArrayBuffer.empty[Session]
            var cur = state.getOption
            for (e <- evs) {
              cur match {
                case Some(s) if e.us - s.lastUs <= gapUs && e.us >= s.startUs - gapUs =>
                  // forward extension, or bounded out-of-order: merge
                  cur = Some(SessState(math.min(s.startUs, e.us),
                    math.max(s.lastUs, e.us), s.n + 1, s.sum + e.value))
                case Some(s) if e.us < s.startUs - gapUs =>
                  // late beyond the reorder budget: emit standalone, keep state
                  out += Session(uid, e.us, e.us, 1, e.value)
                case Some(s) =>
                  out += Session(uid, s.startUs, s.lastUs, s.n, s.sum)
                  cur = Some(SessState(e.us, e.us, 1, e.value))
                case None =>
                  cur = Some(SessState(e.us, e.us, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (eventTimeTimeout) {
                // a far-late batch can leave lastUs+gap behind the current
                // watermark; Spark rejects a timeout below the watermark,
                // so clamp (the session then times out on the next batch)
                val target = (s.lastUs + gapUs) / 1000L
                val floor = state.getCurrentWatermarkMs() + 1
                state.setTimeoutTimestamp(math.max(target, floor))
              }
            }
            out.iterator
          }
      }
  }
}
