package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ingest.SampleConversion
import graft.time.TimeResolver
import java.time.Instant

/** Prometheus HTTP API source (reference: internal/prometheus/client.go;
  * SURVEY §2.1 S1-S6). The transport is injectable — the offline harness
  * uses canned payloads, a deployment plugs in a real HTTP client — and
  * everything after the byte boundary is Spark-native: the response JSON
  * is parsed with the SQL JSON reader against the wire schema
  * (models.go:9-36), then flows through [[SampleConversion]] into
  * `metrics_data` rows. No hand-rolled JSON walking, no driver-side loops
  * over samples.
  *
  * Deployment note (SURVEY S1): at scale the fetch itself is one small
  * HTTP response per query — the *data* volume lives in the fact table,
  * so a driver-side fetch + distributed transform is the right split; a
  * DataSourceV2 TableProvider adds nothing here.
  */
object PromClient {

  /** The byte boundary. `get` returns the HTTP response body. */
  trait Transport extends Serializable {
    def get(path: String, params: Map[String, String]): String
  }

  /** Wire schema for /api/v1/query and /api/v1/query_range responses:
    * samples arrive as [epoch_float, "value_string"] pairs (models.go:21-36).
    */
  val responseSchema: StructType = StructType(Seq(
    StructField("status", StringType),
    StructField("data", StructType(Seq(
      StructField("resultType", StringType),
      StructField("result", ArrayType(StructType(Seq(
        StructField("metric", MapType(StringType, StringType)),
        StructField("value", ArrayType(StringType)),
        StructField("values", ArrayType(ArrayType(StringType))))))))))))

  private def parseResponse(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    val parsed = spark.createDataset(Seq(body))
      .select(from_json(col("value"), responseSchema).as("r"))
    val status = parsed.select(col("r.status"), col("r.data.resultType")).head()
    val st = status.getString(0)
    require(st == "success", s"prometheus error response: status=$st")
    val rt = status.getString(1)
    // executor accepts only vector and matrix; anything else is a failed
    // execution (reference: executor.go:164-182)
    require(rt == "vector" || rt == "matrix", s"unsupported result type: $rt")
    parsed.select(col("r.data.resultType").as("resultType"),
      explode(col("r.data.result")).as("s"))
      .select(col("resultType"), col("s.metric").as("metric"),
        col("s.value").as("value"), col("s.values").as("values"))
  }

  /** S1: instant query at an explicit time → records. */
  def instantQuery(spark: SparkSession, transport: Transport, promql: String,
      at: Instant, queryId: String, now: Instant,
      timeExpr: Option[String] = None): DataFrame = {
    val body = transport.get("/api/v1/query",
      Map("query" -> promql, "time" -> at.getEpochSecond.toString))
    val rows = parseResponse(spark, body)
    SampleConversion.fromVector(rows.filter(col("resultType") === "vector"),
      queryId, now, timeExpr)
  }

  /** S2: range query over [start, end] at `step` → records (matrix
    * flattened, T2).
    */
  def rangeQuery(spark: SparkSession, transport: Transport, promql: String,
      start: Instant, end: Instant, step: String, queryId: String,
      now: Instant): DataFrame = {
    val body = transport.get("/api/v1/query_range",
      Map("query" -> promql, "start" -> start.getEpochSecond.toString,
        "end" -> end.getEpochSecond.toString,
        "step" -> TimeResolver.parseStepSeconds(step).toString))
    val rows = parseResponse(spark, body)
    SampleConversion.fromMatrix(rows.filter(col("resultType") === "matrix"),
      queryId, now, Some((start, end)))
  }

  /** S3/S4/S5: unified dispatch by configured time-range type, resolving
    * the config's time expressions against the pinned now (client.go:206-230;
    * unknown types default to instant).
    */
  def queryWithTimeRange(spark: SparkSession, transport: Transport,
      cfg: graft.model.QueryConfig, now: Instant): DataFrame = {
    val r = TimeResolver(now)
    cfg.time_range_type match {
      case "range" =>
        val (s, e) = r.resolveRange(
          cfg.time_range_start.getOrElse(""), cfg.time_range_end.getOrElse(""))
        rangeQuery(spark, transport, cfg.query, s, e,
          cfg.time_range_step.getOrElse("60s"), cfg.query_id, now)
      case _ =>
        val timeExpr = cfg.time_range_time.getOrElse("")
        instantQuery(spark, transport, cfg.query, r.resolve(timeExpr),
          cfg.query_id, now, Some(timeExpr))
    }
  }

  /** S6: metric-name discovery via label values of `__name__`
    * (client.go:310-326).
    */
  def metricNames(spark: SparkSession, transport: Transport): Seq[String] = {
    import spark.implicits._
    val body = transport.get("/api/v1/label/__name__/values", Map.empty)
    val schema = StructType(Seq(
      StructField("status", StringType),
      StructField("data", ArrayType(StringType))))
    spark.createDataset(Seq(body))
      .select(explode(from_json(col("value"), schema).getField("data")))
      .as[String].collect().toSeq
  }

  /** O9: health probe — the reference runs the trivial `up` query before
    * starting service (executor.go:464-477).
    */
  def healthCheck(spark: SparkSession, transport: Transport, now: Instant): Boolean =
    try { instantQuery(spark, transport, "up", now, "health", now).count() >= 0 }
    catch { case _: Exception => false }
}
