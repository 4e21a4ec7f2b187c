package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util

/** DataSource V2 for the RANGE/backfill side of the Prometheus source —
  * the case [[PromClient]]'s driver-side fetch is wrong for. The
  * reference's repair tool walks a 90-day window one day at a time with
  * a driver-side sleep per day (reference: cmd/repair/main.go:164-381);
  * here the window is planned as one InputPartition per time slice and
  * each EXECUTOR evaluates its slice in parallel, which is how a
  * 1000-executor cluster backfills months in one job.
  *
  * Time-bound and series-equality predicates push into planning via
  * `SupportsPushDownFilters`: a narrowed window plans fewer partitions
  * (visible in `df.rdd.getNumPartitions`), and readers apply the exact
  * bounds so Spark re-evaluates nothing. The sample payload itself is
  * the offline harness's deterministic stand-in for the HTTP body —
  * swap `SliceReader.sample` for a transport call per slice to deploy.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.PromRangeSource")
  *   .option("metric", "up").option("start", 0).option("end", 864000)
  *   .option("step", 60).option("series", 4).option("slice", 86400)
  *   .load()
  * }}}
  */
class PromRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PromRangeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PromRangeTable(new CaseInsensitiveStringMap(properties))
}

object PromRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("metric_name", StringType, nullable = false),
    StructField("series_id", LongType, nullable = false),
    StructField("e", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Deterministic sample value — the canned-payload stand-in: a pure
    * function of (metric, series, time), so tests and oracles can
    * recompute it.
    */
  def sample(metric: String, series: Long, e: Long): Double =
    (((series * 2654435761L + e * 40503L + metric.length) % 100000L +
      100000L) % 100000L) / 100.0
}

final class PromRangeTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"prom_range(${options.get("metric")})"
  override def schema(): StructType = PromRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new PromRangeScanBuilder(
      options.get("metric"),
      options.get("start").toLong, options.get("end").toLong,
      Option(options.get("step")).map(_.toLong).getOrElse(60L),
      Option(options.get("series")).map(_.toLong).getOrElse(1L),
      Option(options.get("slice")).map(_.toLong).getOrElse(86400L))
}

final class PromRangeScanBuilder(metric: String, start0: Long, end0: Long,
    step: Long, numSeries: Long, slice: Long)
    extends ScanBuilder with SupportsPushDownFilters {

  private var lo = start0
  private var hi = end0
  private var seriesEq: Option[Long] = None
  private var unsat = false // conflicting pushed equalities -> empty scan
  private var pushed = Array.empty[Filter]

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // literals arrive boxed as Integer or Long depending on how the
    // predicate was written — accept any integral number
    object L { def unapply(v: Any): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue); case _ => None } }
    val (accepted, rejected) = filters.partition {
      case GreaterThan("e", L(v))        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("e", L(v)) => lo = math.max(lo, v); true
      case LessThan("e", L(v))           => hi = math.min(hi, v - 1); true
      case LessThanOrEqual("e", L(v))    => hi = math.min(hi, v); true
      case EqualTo("series_id", L(v))    =>
        // a second, different equality makes the conjunction
        // unsatisfiable — it must yield the empty scan, not overwrite
        if (seriesEq.exists(_ != v)) unsat = true
        seriesEq = Some(v); true
      case _ => false
    }
    pushed = accepted
    rejected // readers apply accepted bounds exactly; nothing re-evaluated
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = PromRangeSource.schema
    override def description(): String =
      s"PromRangeScan(metric=$metric, e=[$lo,$hi], step=$step, " +
        s"series=${seriesEq.map(_.toString).getOrElse(s"*$numSeries")})"
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      // a fully-pushed filter is never re-checked by Spark, so a pushed
      // series_id outside the source's domain [0, numSeries) must plan
      // the empty scan — generating rows for it would fabricate samples
      if (hi < lo || unsat ||
        seriesEq.exists(v => v < 0 || v >= numSeries)) return Array.empty
      // align slices to the ORIGINAL grid so pushdown narrows the plan
      // without moving slice boundaries (repair J6: one slice ≈ one day)
      val firstSlice = (lo - start0) / slice
      val lastSlice = (hi - start0) / slice
      (firstSlice to lastSlice).map { s =>
        PromSlice(metric, numSeries, seriesEq,
          math.max(lo, start0 + s * slice),
          math.min(hi, start0 + (s + 1) * slice - 1),
          start0, step): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[InternalRow] =
          new SliceReader(p.asInstanceOf[PromSlice])
      }
  }
}

/** One time slice of the range query; fully describes the executor-side
  * work, like one day of the reference's repair loop.
  */
final case class PromSlice(metric: String, numSeries: Long,
    seriesEq: Option[Long], lo: Long, hi: Long, grid0: Long, step: Long)
    extends InputPartition

final class SliceReader(p: PromSlice) extends PartitionReader[InternalRow] {
  // step grid aligned to the range start, clipped to the slice bounds
  private val firstTick =
    p.grid0 + math.max(0L, (p.lo - p.grid0 + p.step - 1) / p.step) * p.step
  private val seriesIds: Seq[Long] =
    p.seriesEq.map(Seq(_)).getOrElse(0L until p.numSeries)
  private var e = firstTick
  private var si = 0
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (e > p.hi || seriesIds.isEmpty) return false
    val s = seriesIds(si)
    row = InternalRow(UTF8String.fromString(p.metric), s, e,
      PromRangeSource.sample(p.metric, s, e))
    si += 1
    if (si == seriesIds.size) { si = 0; e += p.step }
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
