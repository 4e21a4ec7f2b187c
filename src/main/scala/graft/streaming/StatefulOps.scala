package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-series streaming state via mapGroupsWithState — the Spark
  * primitive for semantics the built-in windowed aggregations can't
  * express. Used here for the PromQL-ish "live series state": per series,
  * the running sample count, the latest (ts, value), and the max gap
  * between consecutive samples (a staleness signal the reference's audit
  * table can only approximate after the fact).
  *
  * State is per-key and bounded (a few scalars), so at cluster scale this
  * shards with the key hash and checkpoints via the state store like any
  * built-in stateful op.
  */
object StatefulOps {

  final case class Sample(skey: String, ts: Long, value: Double)
  final case class SeriesState(count: Long, lastTs: Long, lastValue: Double,
      maxGapSec: Long)

  implicit val sampleEnc: Encoder[Sample] = Encoders.product[Sample]
  implicit val stateEnc: Encoder[SeriesState] = Encoders.product[SeriesState]
  implicit val keyEnc: Encoder[String] = Encoders.STRING
  implicit val outEnc: Encoder[(String, SeriesState)] =
    Encoders.tuple(Encoders.STRING, stateEnc)

  /** Fold a micro-batch of samples into the running per-series state. */
  def updateSeries(key: String, samples: Iterator[Sample],
      state: GroupState[SeriesState]): (String, SeriesState) = {
    val sorted = samples.toSeq.sortBy(s => (s.ts, s.value))
    var cur = state.getOption.getOrElse(SeriesState(0L, Long.MinValue, 0d, 0L))
    sorted.foreach { s =>
      val gap = if (cur.lastTs == Long.MinValue) 0L else s.ts - cur.lastTs
      cur = SeriesState(cur.count + 1, s.ts, s.value, math.max(cur.maxGapSec, gap))
    }
    state.update(cur)
    key -> cur
  }

  /** Attach the stateful fold to a (streaming or batch) Dataset[Sample].
    * With a streaming source use OutputMode.Update; the same code path
    * works in batch for tests.
    */
  def seriesState(samples: Dataset[Sample]): Dataset[(String, SeriesState)] =
    samples.groupByKey(_.skey)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateSeries _)
}
