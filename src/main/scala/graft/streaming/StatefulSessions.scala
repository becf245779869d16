package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the Spark-native
  * mechanism for session semantics no built-in window covers (SURVEY T8 is
  * an extension surface: the reference has no event-time state at all).
  *
  * Sessions close on event-time inactivity: state carries (start, end,
  * count) per key; the timeout is the session end plus the gap, measured
  * against the watermark, so results are deterministic under replays and
  * out-of-order arrival within the watermark delay — the same guarantees the
  * pool sync layer provides for offsets.
  */
object StatefulSessions {

  case class Event(user: String, ts: Timestamp)
  case class SessionState(start: Long, end: Long, count: Long)
  case class Session(user: String, start: Timestamp, end: Timestamp, count: Long)

  /** Sessionize a watermarked event stream. `events` must already have
    * `withWatermark` applied on `ts`; emitted rows are CLOSED sessions only
    * (append-mode compatible).
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: String, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap: the session is closed, emit and clear
            val s = state.get
            state.remove()
            Iterator(Session(user, new Timestamp(s.start), new Timestamp(s.end), s.count))
          } else {
            val times = batch.map(_.ts.getTime).toSeq
            val merged = state.getOption match {
              case Some(s) => SessionState(
                s.start min times.min, s.end max times.max, s.count + times.size)
              case None => SessionState(times.min, times.max, times.size.toLong)
            }
            state.update(merged)
            state.setTimeoutTimestamp(merged.end + gapMs)
            Iterator.empty
          }
      }
  }
}
