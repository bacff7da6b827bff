package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful gap-based sessionization over a stream —
  * `flatMapGroupsWithState` with event-time timeouts: the streaming twin
  * of the batch `sessionize` operator (same 30-minute-gap semantics).
  *
  * Per-key state is ONE open session aggregate (start, last, count, sum)
  * — O(1) per active key, never the event backlog. Sessions close two
  * ways: a new event arrives more than `gap` after the last (emitted
  * immediately), or the watermark passes last + gap (event-time timeout
  * emits the open session). Both paths guarantee every session is emitted
  * exactly once in append mode.
  */
object SessionizeState {

  val GapMs: Long = 30 * 60 * 1000L

  case class Evt(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(start: Long, last: Long, n: Int, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int, total_value: Double)

  private def toSession(uid: Long, s: OpenSession): Session =
    Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)

  /** The state-transition function: fold new events (sorted by time) into
    * the open session, emitting every session a gap closes. */
  def updateState(uid: Long, events: Iterator[Evt],
                  state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(uid, _)).iterator
      state.remove()
      out
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.last <= GapMs =>
            open = Some(OpenSession(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += toSession(uid, s)
            open = Some(OpenSession(t, t, 1, e.value))
          case None =>
            open = Some(OpenSession(t, t, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + GapMs)
      }
      closed.result().iterator
    }
  }

  /** Wire the stateful sessionizer onto a stream of events; the event-time
    * watermark on `ts` doubles as the timeout clock. */
  def sessions(events: Dataset[Evt], watermark: String = "1 hour"): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val so = Encoders.product[OpenSession]
    implicit val ke = Encoders.scalaLong
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateState)
  }
}
