package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** O10: per-query execution metrics via QueryExecutionListener — the
  * Spark-native analogue of the reference's structured slog fields
  * (component / duration / row counts, internal/logger/logger.go). Every
  * successful or failed action is recorded with its duration; the audit
  * writer can drain the buffer into the `query_executions` table.
  */
final class MetricsListener extends QueryExecutionListener {

  final case class QueryMetric(action: String, durationMs: Long,
      outputRows: Option[Long], error: Option[String])

  private val buf = new ConcurrentLinkedQueue[QueryMetric]()

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = {
    val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    buf.add(QueryMetric(funcName, durationNs / 1000000L, rows, None))
  }

  override def onFailure(funcName: String, qe: QueryExecution,
      error: Exception): Unit =
    buf.add(QueryMetric(funcName, -1L, None,
      Some(Option(error.getMessage).getOrElse(error.getClass.getName))))

  /** Drain recorded metrics (oldest first). */
  def drain(): Seq[QueryMetric] = {
    val out = Seq.newBuilder[QueryMetric]
    var m = buf.poll()
    while (m != null) { out += m; m = buf.poll() }
    out.result()
  }
}

object MetricsListener {
  /** Attach a fresh listener to the session and return it. */
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
