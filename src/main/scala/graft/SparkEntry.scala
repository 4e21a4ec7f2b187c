package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, ExtQueries, LifecycleQueries, PromQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each registered query pairs a Spark implementation with a DuckDB oracle
  * over the same parquet fixtures; packs live under [[graft.queries]].
  */
object SparkEntry {

  private def packs: Map[String, ((SparkSession, String) => DataFrame, String)] =
    PromQueries.all ++ AnalyticsQueries.all ++ LifecycleQueries.all ++
      ExtQueries.all ++ WarehouseQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PromQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map { case (name, (fn, _)) => name -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.collect { case (name, (_, sql)) if sql.nonEmpty => name -> sql }

  /** SQL surface: register the engine's tables as temp views so
    * `spark.sql(...)` works directly — the fixture tables plus the
    * ingested `metrics` fact frame (cached). A reference user's read-side
    * SQL runs against these.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    graft.ingest.EventsIngest.cachedMetrics(spark, sfDir)
      .createOrReplaceTempView("metrics")
    graft.ingest.EventsIngest.readEvents(spark, sfDir)
      .createOrReplaceTempView("events")
    for (t <- Seq("documents", "embeddings", "lineitem", "orders",
        "customer", "supplier", "part", "nation", "region"))
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
  }
}
