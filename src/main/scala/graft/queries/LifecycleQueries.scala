package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.EventsIngest

/** Time-resolver-driven windows (SURVEY §2.7 F1-F11), the simulated audit
  * surface (§2.8 W3/O6, S10), and the repair/retention reads (§2.6 J1,
  * §2.2 W7). Every window boundary below is produced by
  * [[graft.time.TimeResolver]] from the pinned now and interpolated into
  * the oracle — both sides resolve from one constant.
  */
object LifecycleQueries {
  import Pinned.{resolver, Te}

  private def metrics(spark: SparkSession, sfDir: String): DataFrame =
    EventsIngest.cachedMetrics(spark, sfDir)

  private def epoch(expr: String): Long = resolver.resolve(expr).getEpochSecond

  private val baseCte: String =
    """WITH m AS (
      |  SELECT 'q_' || event_type AS query_id, event_type AS metric,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS e,
      |         CAST(ts AS DATE) AS d, value AS v
      |  FROM events
      |)""".stripMargin

  // ------------------------------------------------------- F3 yesterday

  /** F3: `yesterday` → `yesterday_end` window, counts per metric. */
  def windowYesterday(spark: SparkSession, sfDir: String): DataFrame = {
    val (s, e) = resolver.resolveRange("yesterday", "yesterday_end")
    metrics(spark, sfDir)
      .filter(col("e").between(s.getEpochSecond, e.getEpochSecond))
      .groupBy(col("metric_name").as("metric"))
      .agg(count(lit(1)).as("n"))
  }

  val windowYesterdayOracle: String =
    baseCte +
      s"""
         |SELECT metric, count(*) AS n FROM m
         |WHERE e BETWEEN ${epoch("yesterday")} AND ${epoch("yesterday_end")}
         |GROUP BY metric""".stripMargin

  // ------------------------------------------------------- F4 last week

  /** F4: previous Monday-start week. */
  def windowLastWeek(spark: SparkSession, sfDir: String): DataFrame = {
    val (s, e) = resolver.resolveRange("last_week", "last_week_end")
    metrics(spark, sfDir)
      .filter(col("e").between(s.getEpochSecond, e.getEpochSecond))
      .groupBy(col("metric_name").as("metric"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("vsum"))
  }

  val windowLastWeekOracle: String =
    baseCte +
      s"""
         |SELECT metric, count(*) AS n,
         |       CAST(sum(CAST(v AS DECIMAL(20,6))) AS DOUBLE) AS vsum
         |FROM m
         |WHERE e BETWEEN ${epoch("last_week")} AND ${epoch("last_week_end")}
         |GROUP BY metric""".stripMargin

  // ------------------------------------------- F9/F10 compound offsets

  /** F9/F10: compound duration offsets from now (`-1d12h` → `-1d`),
    * the documented superset of the reference's single-unit regex.
    */
  def windowOffsets(spark: SparkSession, sfDir: String): DataFrame = {
    val (s, e) = resolver.resolveRange("-1d12h", "-1d")
    metrics(spark, sfDir)
      .filter(col("e").between(s.getEpochSecond, e.getEpochSecond))
      .groupBy(col("metric_name").as("metric"))
      .agg(count(lit(1)).as("n"))
  }

  val windowOffsetsOracle: String =
    baseCte +
      s"""
         |SELECT metric, count(*) AS n FROM m
         |WHERE e BETWEEN ${epoch("-1d12h")} AND ${epoch("-1d")}
         |GROUP BY metric""".stripMargin

  // ------------------------------------------------- W3/O6 audit shape

  /** Simulated run history: one audit row per (query_id, day) with its
    * record count — the shape the executor appends per run
    * (executor.go:41-47, 207-218; mysql.go:139-163).
    */
  def runHistory(spark: SparkSession, sfDir: String): DataFrame =
    metrics(spark, sfDir)
      .groupBy(col("query_id"), to_date(col("collected_at")).as("run_date"))
      .agg(count(lit(1)).as("records_count"))
      .withColumn("status", lit("success"))

  val runHistoryOracle: String =
    baseCte +
      """
        |SELECT query_id, d AS run_date, count(*) AS records_count,
        |       'success' AS status
        |FROM m GROUP BY query_id, d""".stripMargin

  // ------------------------------------------------------ S10 history read

  /** Execution-history read (mysql.go:216-259): latest runs first, top 20,
    * unique (query_id, run_date) tiebreak.
    */
  def execHistoryTopk(spark: SparkSession, sfDir: String): DataFrame =
    runHistory(spark, sfDir)
      .orderBy(desc("run_date"), asc("query_id"))
      .limit(20)

  val execHistoryTopkOracle: String =
    baseCte +
      """
        |SELECT query_id, d AS run_date, count(*) AS records_count,
        |       'success' AS status
        |FROM m GROUP BY query_id, d
        |ORDER BY run_date DESC, query_id ASC LIMIT 20""".stripMargin

  // --------------------------------------------------------- J1 anti-join

  /** Repair candidate days (cmd/repair/main.go:317-334, 557-576): the one
    * join in the system — a LEFT ANTI of the requested date range against
    * days that already have data. Missing days get recomputed; present
    * days are skipped (idempotent backfill).
    */
  def repairCandidates(spark: SparkSession, sfDir: String): DataFrame = {
    val days = spark.range(1)
      .select(explode(expr(
        "sequence(DATE '2024-01-25', DATE '2024-02-04', INTERVAL 1 DAY)"))
        .as("missing_day"))
    val existing = metrics(spark, sfDir)
      .filter(col("query_id") === "q_purchase")
      .select(to_date(col("collected_at")).as("have_day"))
      .distinct()
    days.join(existing, days("missing_day") === existing("have_day"), "left_anti")
  }

  val repairCandidatesOracle: String =
    """SELECT CAST(unnest(generate_series(DATE '2024-01-25', DATE '2024-02-04',
      |                                   INTERVAL 1 DAY)) AS DATE) AS missing_day
      |EXCEPT
      |SELECT DISTINCT CAST(ts AS DATE) FROM events WHERE event_type = 'purchase'""".stripMargin

  // -------------------------------------------------------- W7 retention

  /** Retention cleanup preview (mysql.go:275-289): the per-day delete set
    * below the cutoff — with the fact table partitioned on collect_date
    * these deletes are partition drops, no row scans.
    */
  def retentionCutoff(spark: SparkSession, sfDir: String): DataFrame =
    metrics(spark, sfDir)
      .filter(col("collected_at") < to_timestamp(lit("2024-01-08 00:00:00")))
      .groupBy(to_date(col("collected_at")).as("del_day"))
      .agg(count(lit(1)).as("cnt"))

  val retentionCutoffOracle: String =
    baseCte +
      """
        |SELECT d AS del_day, count(*) AS cnt FROM m
        |WHERE d < DATE '2024-01-08' GROUP BY d""".stripMargin

  // ----------------------------------------------------- W9 stats probe

  /** Table stats probe (mysql.go:317-349): row counts per table —
    * connection-pool stats have no parquet analogue.
    */
  def tableStats(spark: SparkSession, sfDir: String): DataFrame = {
    val tables = Seq("events", "documents", "embeddings", "lineitem", "orders")
    tables.map { t =>
      val df =
        if (t == "events") EventsIngest.widenedEvents(spark, sfDir)
        else spark.read.parquet(s"$sfDir/$t.parquet")
      df.select(lit(t).as("tbl"), lit(1).as("one"))
        .groupBy(col("tbl")).agg(count(lit(1)).as("n_rows"))
    }.reduce(_ union _)
  }

  val tableStatsOracle: String =
    Seq("events", "documents", "embeddings", "lineitem", "orders")
      .map(t => s"SELECT '$t' AS tbl, count(*) AS n_rows FROM $t")
      .mkString("\nUNION ALL\n")

  // every entry is a pure plan builder → statement-cached (see
  // TableCache.planCachedPack's purity contract)
  val all: Map[String, ((SparkSession, String) => DataFrame, String)] =
    graft.sources.TableCache.planCachedPack(Map(
    "table_stats" -> ((tableStats _, tableStatsOracle)),
    "window_yesterday" -> ((windowYesterday _, windowYesterdayOracle)),
    "window_last_week" -> ((windowLastWeek _, windowLastWeekOracle)),
    "window_offsets" -> ((windowOffsets _, windowOffsetsOracle)),
    "run_history" -> ((runHistory _, runHistoryOracle)),
    "exec_history_topk" -> ((execHistoryTopk _, execHistoryTopkOracle)),
    "repair_candidates" -> ((repairCandidates _, repairCandidatesOracle)),
    "retention_cutoff" -> ((retentionCutoff _, retentionCutoffOracle))))
}
