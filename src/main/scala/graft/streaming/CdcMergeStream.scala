package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One change-data-capture record: an upsert carrying the new content
  * fingerprint, or a delete. Top-level so the encoder whole-stage-
  * codegens (nested case classes fall back to interpreted projections).
  */
final case class CdcEvent(doc_id: Long, op: String, fp: String,
    ts: java.sql.Timestamp)

/** Last-writer-wins state per key: the newest change seen so far. */
final case class CdcState(e: Long, op: String, fp: String)

/** A live row of the maintained snapshot, emitted at flush time. */
final case class CdcRow(doc_id: Long, fp: String, e: Long)

/** Streaming CDC merge — materialized-view maintenance as a stateful
  * stream: fold a change stream (upserts/deletes) into last-writer-wins
  * state per key, and emit the LIVE rows once the watermark proves no
  * older change can still arrive (event-time timeout at the flush
  * boundary). The batch equivalent is a window rank over the unioned
  * changelog; the streaming form never re-reads the log — the state IS
  * the snapshot, sharded by key like any built-in stateful operator, so
  * a 1000-executor cluster holds a 100 TB corpus's live keys the same
  * way it holds any keyed state (compaction/sharding is the state
  * store's job, not the query's).
  *
  * Late-change rule, stated — it is TWO-layered, and both layers
  * matter at deployment:
  *  1. Spark's stateful late-row filter drops any change older than
  *     the current watermark before the fold ever sees it. Under the
  *     gate's 0-second delay that means a change arriving after the
  *     watermark passed its event time is dropped even when it would
  *     have WON last-writer-wins for its key (its key's state may be
  *     older than the global watermark) — the watermark delay IS the
  *     deployment's lateness tolerance, exactly as for every built-in
  *     stateful operator.
  *  2. A change that survives the filter folds last-writer-wins by
  *     EVENT time, not arrival: strictly older than the held state is
  *     ignored; equal times take the later arrival — the fixture keys
  *     each batch to distinct times so both engines agree without a
  *     tie-break column. CdcMergeSpec exercises this layer explicitly
  *     against RECOVERED state (a watermark delay lets a stale change
  *     through the filter, and a stale-timestamped new key witnesses
  *     that the contest happened).
  */
object CdcMergeStream {

  implicit val evEnc: Encoder[CdcEvent] = Encoders.product[CdcEvent]
  implicit val stEnc: Encoder[CdcState] = Encoders.product[CdcState]
  implicit val outEnc: Encoder[CdcRow] = Encoders.product[CdcRow]
  implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

  def update(flushAtSec: Long)(id: Long, evs: Iterator[CdcEvent],
      state: GroupState[CdcState]): Iterator[CdcRow] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      if (s.op == "upsert") Iterator(CdcRow(id, s.fp, s.e))
      else Iterator.empty
    } else {
      var cur = state.getOption
      evs.foreach { ev =>
        val e = ev.ts.getTime / 1000
        cur match {
          case Some(s) if e < s.e => // older change lost the write race
          case _ => cur = Some(CdcState(e, ev.op, ev.fp))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // the timeout must sit above the current watermark or Spark
        // rejects it; the flush sentinel batch pushes the watermark past
        // flushAt, so every real key fires on the trigger after it
        state.setTimeoutTimestamp(
          math.max(flushAtSec * 1000, state.getCurrentWatermarkMs + 1))
      }
      Iterator.empty
    }
  }

  /** Attach to a streaming Dataset[CdcEvent]; emits each live row
    * exactly once, after the watermark passes `flushAtSec`.
    */
  def merged(ev: Dataset[CdcEvent], flushAtSec: Long,
      watermark: String = "0 seconds"): Dataset[CdcRow] =
    ev.withWatermark("ts", watermark)
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(flushAtSec))
}
