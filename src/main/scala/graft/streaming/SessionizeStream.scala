package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for streaming sessionization; top-level so the encoder
  * whole-stage-codegens (nested case classes fall back to interpreted
  * projections).
  */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

/** Open-session state carried between micro-batches. */
final case class OpenSession(startE: Long, lastE: Long, n: Long)

/** A session emitted once it can no longer grow. */
final case class ClosedSession(user_id: Long, session_start_e: Long,
    n_events: Long, duration_sec: Long)

/** Streaming gap-sessionization — the event-time-timeout shape that the
  * batch `sessionize` query cannot give a live pipeline: sessions close
  * either because a same-batch event arrives past the gap, or because
  * the WATERMARK passes start-of-gap with no new events, at which point
  * `flatMapGroupsWithState` fires the timed-out state and the closed
  * session is emitted exactly once (Append mode). State is O(1) per live
  * user and shards by the group key, so a 1000-executor cluster scales
  * this by key hash like any built-in stateful operator.
  */
object SessionizeStream {

  implicit val evEnc: Encoder[SessionEvent] = Encoders.product[SessionEvent]
  implicit val stEnc: Encoder[OpenSession] = Encoders.product[OpenSession]
  implicit val outEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]
  implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

  def update(gapSec: Long)(user: Long, evs: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    def close(s: OpenSession) =
      ClosedSession(user, s.startE, s.n, s.lastE - s.startE)
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(close(s))
    } else {
      val es = evs.map(_.ts.getTime / 1000).toSeq.sorted
      var closed = List.empty[ClosedSession]
      var cur = state.getOption
      es.foreach { e =>
        cur match {
          case Some(s) if e - s.lastE <= gapSec =>
            cur = Some(OpenSession(s.startE, math.max(s.lastE, e), s.n + 1))
          case Some(s) =>
            closed ::= close(s)
            cur = Some(OpenSession(e, e, 1))
          case None =>
            cur = Some(OpenSession(e, e, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // the timeout must sit above the current watermark or Spark
        // rejects it; a session whose gap already expired will then fire
        // on the next trigger instead of this one
        state.setTimeoutTimestamp(
          math.max((s.lastE + gapSec) * 1000, state.getCurrentWatermarkMs + 1))
      }
      closed.reverseIterator
    }
  }

  /** Attach to a streaming Dataset[SessionEvent]; emits each session
    * exactly once, after it is provably complete under the watermark.
    */
  def sessions(ev: Dataset[SessionEvent], gapSec: Long = 1800,
      watermark: String = "30 minutes"): Dataset[ClosedSession] =
    ev.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(gapSec))
}
