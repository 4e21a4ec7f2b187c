package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.QueryConfig

/** Query-registry CRUD (reference: internal/config/database_config.go;
  * SURVEY §2.1 S7/S8, §2.2 W4-W6) over a parquet-backed config table.
  *
  * Parquet has no transactional upsert, so mutations are read-modify-
  * overwrite — acceptable at config-table scale (tens of rows) and
  * documented as non-atomic (SURVEY §7.3 item 4); a lakehouse table
  * format would swap `write` for a MERGE without touching callers.
  */
final class ConfigStore(spark: SparkSession, path: String) {
  import spark.implicits._

  def loadAll(): Dataset[QueryConfig] =
    spark.read.parquet(path).as[QueryConfig]

  /** S7: enabled configs, oldest first (database_config.go:11-91). */
  def loadEnabled(): Dataset[QueryConfig] =
    loadAll().filter(col("enabled")).orderBy(col("query_id"))

  /** S8: single-config lookup, enabled only (cmd/repair/main.go:415-460). */
  def get(queryId: String): Option[QueryConfig] =
    loadAll().filter(col("query_id") === queryId && col("enabled"))
      .collect().headOption

  private def overwrite(ds: Dataset[QueryConfig]): Unit = {
    // materialize before overwriting the file we read from
    val rows = ds.collect().toSeq
    spark.createDataset(rows).coalesce(1).write.mode("overwrite").parquet(path)
  }

  def init(configs: Seq[QueryConfig]): Unit =
    spark.createDataset(configs).coalesce(1).write.mode("overwrite").parquet(path)

  /** W4: upsert on query_id (INSERT .. ON DUPLICATE KEY UPDATE,
    * database_config.go:94-158).
    */
  def upsert(cfg: QueryConfig): Unit = {
    val others = loadAll().filter(col("query_id") =!= cfg.query_id)
    overwrite(others.union(spark.createDataset(Seq(cfg))))
  }

  /** W5: delete; error when the id doesn't exist (database_config.go:161-179). */
  def delete(queryId: String): Unit = {
    val all = loadAll().collect().toSeq
    require(all.exists(_.query_id == queryId), s"no such query config: $queryId")
    init(all.filterNot(_.query_id == queryId))
  }

  /** W6: enable/disable toggle (database_config.go:182-200). */
  def setEnabled(queryId: String, enabled: Boolean): Unit = {
    val all = loadAll().collect().toSeq
    require(all.exists(_.query_id == queryId), s"no such query config: $queryId")
    init(all.map(c => if (c.query_id == queryId) c.copy(enabled = enabled) else c))
  }
}
