package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One sampled observation: group key (series, day), the value, its
  * deterministic md5 rank `r` (computed batch-side on event_id, so both
  * engines and both execution modes hash identically), and the harness
  * event time driving the watermark. Top-level for codegen'd encoders.
  */
final case class QsEvent(series: String, day: java.sql.Date, value: Double,
    r: String, ts: java.sql.Timestamp)

final case class QsKey(series: String, day: java.sql.Date)

/** One retained sample: the 128-bit md5 rank packed into two longs
  * (compared UNSIGNED — for fixed-width lowercase hex, numeric order
  * equals the lexicographic string order the batch twin ranks by;
  * PropertySpec's "packed two-long unsigned rank order" property pins
  * that equivalence for the full 128-bit encoding, and
  * QuantileSketchStreamSpec exercises it end-to-end against hex-string
  * bottom-k expectations) plus the value. 16 rank bytes
  * instead of a 32-char string keeps the state row narrow — state
  * bytes are the operator's scale currency.
  */
final case class QsSample(rHi: Long, rLo: Long, value: Double)

/** Per-group state: the bottom-[[QuantileSketchStream.Cap]] sample by
  * md5 rank — a mergeable bottom-k sketch held AS streaming state.
  */
final case class QsState(sample: List[QsSample])

final case class QsRow(series: String, day: java.sql.Date, p: Int,
    est_value: Double)

/** The per-group mergeable quantile sketch as STREAMING state — the
  * eleventh stream≡batch gate, and the canonical mergeable-state shape:
  * bottom-k-of-union = bottom-k-of-parts, so folding each micro-batch's
  * rows into the held bottom-k sample ([[merge]]) reaches exactly the
  * sample the batch query computes over the whole corpus, regardless of
  * how rows split across batches. Emission follows the CDC gate's
  * event-time-timeout pattern: state flushes once the watermark proves
  * no further rows can arrive, emitting the p50/95/99 estimates from
  * the final sample with the identical rank rule the batch twin and its
  * DuckDB oracle use (`rn == max(1, ceil(p·n/100))` over (value, r)
  * order). 100 TB story: state is ≤ Cap rows per (series, day) key —
  * bounded by the sketch, not by arrival volume — sharded by key across
  * the cluster like any keyed state.
  */
object QuantileSketchStream {

  /** Sample bound per group — MUST match the batch twin's cap
    * (ExtQueries.quantileSketchGrouped) for the shared oracle to hold.
    */
  val Cap = 1024

  implicit val evEnc: Encoder[QsEvent] = Encoders.product[QsEvent]

  /** Pack a 32-hex md5 rank into the sample's two unsigned longs. */
  def fromHex(r: String, value: Double): QsSample =
    QsSample(java.lang.Long.parseUnsignedLong(r.substring(0, 16), 16),
      java.lang.Long.parseUnsignedLong(r.substring(16, 32), 16), value)

  /** Unsigned 128-bit rank order == the batch twin's md5-string order. */
  private[graft] val rankOrd: Ordering[QsSample] = (a: QsSample, b: QsSample) => {
    val c = java.lang.Long.compareUnsigned(a.rHi, b.rHi)
    if (c != 0) c else java.lang.Long.compareUnsigned(a.rLo, b.rLo)
  }

  /** The batch twin's (value, rank) order for the quantile pass. */
  private[graft] val valueOrd: Ordering[QsSample] = (a: QsSample, b: QsSample) => {
    val c = java.lang.Double.compare(a.value, b.value)
    if (c != 0) c else rankOrd.compare(a, b)
  }
  implicit val keyEnc: Encoder[QsKey] = Encoders.product[QsKey]
  implicit val stEnc: Encoder[QsState] = Encoders.product[QsState]
  implicit val outEnc: Encoder[QsRow] = Encoders.product[QsRow]

  /** bottom-k merge: the algebra the gate exists to prove. Pure so the
    * spec can exercise the merge law directly on >Cap synthetic groups
    * (the fixture's groups are all < Cap, where the cap never binds).
    */
  def merge(cur: List[QsSample], incoming: Iterator[QsSample]): List[QsSample] =
    (cur ++ incoming).sorted(rankOrd).take(Cap)

  /** The batch twin's rank rule over the final sample. */
  def quantiles(key: QsKey, sample: List[QsSample]): Iterator[QsRow] = {
    val sorted = sample.sorted(valueOrd)
    val n = sorted.size
    if (n == 0) Iterator.empty
    else Seq(50, 95, 99).iterator.map { p =>
      val idx = math.max(1, math.ceil(p * n / 100.0).toInt)
      QsRow(key.series, key.day, p, sorted(idx - 1).value)
    }
  }

  def update(flushAtSec: Long)(key: QsKey, evs: Iterator[QsEvent],
      state: GroupState[QsState]): Iterator[QsRow] = {
    if (state.hasTimedOut) {
      val sample = state.get.sample
      state.remove()
      quantiles(key, sample)
    } else {
      val merged = merge(state.getOption.map(_.sample).getOrElse(Nil),
        evs.map(e => fromHex(e.r, e.value)))
      state.update(QsState(merged))
      state.setTimeoutTimestamp(
        math.max(flushAtSec * 1000, state.getCurrentWatermarkMs + 1))
      Iterator.empty
    }
  }

  /** Attach to a streaming Dataset[QsEvent]; each group's quantile rows
    * emit exactly once, after the watermark passes `flushAtSec`.
    */
  def sketched(ev: Dataset[QsEvent], flushAtSec: Long): Dataset[QsRow] =
    ev.withWatermark("ts", "0 seconds")
      .groupByKey(e => QsKey(e.series, e.day))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(flushAtSec))
}
