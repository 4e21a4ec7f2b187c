package graft.model

import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Engine data model, derived from the reference DDL
  * (reference: scripts/migrate.sql:18-83) and wire formats
  * (reference: internal/models/models.go:9-36). See SURVEY.md §1.
  */
object Schemas {

  /** Fact table `metrics_data` (reference: scripts/migrate.sql:18-34).
    * `labels` is the one open-schema column: MapType keeps it columnar
    * while preserving ad-hoc key extraction (SURVEY §1.3).
    * Physical layout: parquet partitioned by `collect_date =
    * to_date(collected_at)` so per-day repair (reference:
    * internal/database/mysql.go:292-314) is a dynamic partition
    * overwrite, and retention deletes prune whole partitions.
    */
  val metricsData: StructType = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("metric_name", StringType, nullable = false),
    StructField("labels", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false), // second precision (executor.go:280)
    StructField("result_type", StringType, nullable = false), // 'instant'|'range'|'scalar'
    StructField("collected_at", TimestampType, nullable = false) // day-truncated, SURVEY §1.4
  ))

  /** Audit table `query_executions` (reference: scripts/migrate.sql:38-55,
    * internal/models/models.go:51-62). One row appended per run (W3/O6).
    */
  val queryExecutions: StructType = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("query_name", StringType, nullable = false),
    StructField("status", StringType, nullable = false), // running|success|failed|timeout
    StructField("start_time", TimestampType, nullable = false),
    StructField("end_time", TimestampType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("records_count", IntegerType, nullable = false),
    StructField("error_message", StringType, nullable = true),
    StructField("created_at", TimestampType, nullable = false)
  ))
}

/** Typed ingest-boundary record (reference: internal/models/models.go:39-48). */
final case class MetricRecord(
    query_id: String,
    metric_name: String,
    labels: Map[String, String],
    value: Double,
    timestamp: Timestamp,
    result_type: String,
    collected_at: Timestamp)

/** Query registry row (reference: scripts/migrate.sql:59-83,
  * internal/models/models.go:65-96). `query` holds the PromQL-ish text;
  * time_range_* hold time-expression strings resolved by
  * [[graft.time.TimeResolver]].
  */
final case class QueryConfig(
    query_id: String,
    name: String,
    description: Option[String],
    query: String,
    schedule: String, // 6-field cron, seconds first (migrate.sql:66)
    timeout: String,
    enabled: Boolean,
    retry_count: Int,
    retry_interval: String,
    time_range_type: String, // 'instant' | 'range'
    time_range_time: Option[String],
    time_range_start: Option[String],
    time_range_end: Option[String],
    time_range_step: Option[String])

/** Audit row (reference: internal/models/models.go:51-62). */
final case class QueryExecution(
    query_id: String,
    query_name: String,
    status: String,
    start_time: Timestamp,
    end_time: Option[Timestamp],
    duration_ms: Option[Long],
    records_count: Int,
    error_message: Option[String],
    created_at: Timestamp)
