package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One scored group member arriving on the stream: its transitive
  * near-dup component, quality (distinct-token count), character mass,
  * and the harness event time driving the watermark.
  */
final case class KbEvent(component: Long, doc_id: Long, q: Long, nc: Long,
    ts: java.sql.Timestamp)

/** Per-component survivorship state: member count, total character
  * mass, and the current representative under the batch twin's rule —
  * highest q, tie to the lowest doc_id (lexicographic min of
  * (−q, doc_id), [[graft.queries.ExtQueries.dedupKeepBest]]).
  */
final case class KbState(nDocs: Long, totChars: Long,
    bestQ: Long, bestDoc: Long, bestNc: Long)

final case class KbRow(component: Long, n_docs: Long, keep_doc: Long,
    keep_q: Long, dropped_chars: Long)

/** Canonical-representative SURVIVORSHIP as a streaming materialized
  * view — the twelfth stream≡batch gate: new scored members of each
  * near-dup component arrive across micro-batches and the component's
  * representative is RE-ELECTED in `flatMapGroupsWithState`, flushing
  * once the watermark proves the component complete, under the exact
  * batch oracle (`dedupKeepBestOracle`). The election is a commutative
  * idempotent-free fold (max by (q, −doc_id) plus two counters), so any
  * split of members across batches reaches the batch argmax — the
  * merge law [[KeepBestStreamSpec]] pins on synthetic splits. 100 TB
  * story: state is ONE fixed-width row per component key (never a
  * member list), sharded by component across the cluster; arrival
  * volume never grows a state row.
  */
object KeepBestStream {

  implicit val evEnc: Encoder[KbEvent] = Encoders.product[KbEvent]
  implicit val stEnc: Encoder[KbState] = Encoders.product[KbState]
  implicit val outEnc: Encoder[KbRow] = Encoders.product[KbRow]

  /** The batch twin's election rule: q DESC, doc_id ASC. */
  private def better(q: Long, doc: Long, bq: Long, bdoc: Long): Boolean =
    q > bq || (q == bq && doc < bdoc)

  /** Fold a batch of members into the survivorship state — pure, so the
    * spec can exercise the merge law on arbitrary splits directly.
    */
  def fold(cur: Option[KbState], evs: Iterator[KbEvent]): KbState = {
    var st = cur.getOrElse(KbState(0L, 0L, Long.MinValue, Long.MaxValue, 0L))
    evs.foreach { e =>
      val elect = st.nDocs == 0L || better(e.q, e.doc_id, st.bestQ, st.bestDoc)
      st = KbState(st.nDocs + 1L, st.totChars + e.nc,
        if (elect) e.q else st.bestQ,
        if (elect) e.doc_id else st.bestDoc,
        if (elect) e.nc else st.bestNc)
    }
    st
  }

  def row(component: Long, st: KbState): KbRow =
    KbRow(component, st.nDocs, st.bestDoc, st.bestQ, st.totChars - st.bestNc)

  def update(flushAtSec: Long)(component: Long, evs: Iterator[KbEvent],
      state: GroupState[KbState]): Iterator[KbRow] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      if (st.nDocs == 0L) Iterator.empty else Iterator.single(row(component, st))
    } else {
      state.update(fold(state.getOption, evs))
      state.setTimeoutTimestamp(
        math.max(flushAtSec * 1000, state.getCurrentWatermarkMs + 1))
      Iterator.empty
    }
  }

  /** Attach to a streaming Dataset[KbEvent]; each component's
    * survivorship row emits exactly once, after the watermark passes
    * `flushAtSec`.
    */
  def elected(ev: Dataset[KbEvent], flushAtSec: Long): Dataset[KbRow] =
    ev.withWatermark("ts", "0 seconds")
      .groupByKey(_.component)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(flushAtSec))
}
