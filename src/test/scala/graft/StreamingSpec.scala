package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest
import java.nio.file.Files

/** M5: micro-batch ingestion through foreachBatch with the idempotent
  * partition-overwrite sink (SURVEY §2.8).
  */
/** Top-level so the Dataset encoder codegens (an inner case class forces
  * interpreter-mode projections).
  */
case class Ev(event_id: Long, es: Long, user_id: Long,
    event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def transform(batch: DataFrame): DataFrame =
    batch.select(
      concat(lit("q_"), col("event_type")).as("query_id"),
      col("event_type").as("metric_name"),
      map(lit("user"), col("user_id").cast("string")).as("labels"),
      col("value"),
      timestamp_seconds(col("es")).as("timestamp"),
      lit("instant").as("result_type"),
      date_trunc("DAY", timestamp_seconds(col("es"))).as("collected_at"))

  test("watermarked windowed aggregation over an event stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val d30 = 1706572800L
    val stream = mem.toDF().toDF("es", "metric", "value")
      .withColumn("ts", timestamp_seconds(col("es")))
    val agg = graft.streaming.StreamingIngest.windowedCounts(
      stream, "ts", "metric", "1 hour", "10 minutes")
    val dir = Files.createTempDirectory("winagg").toString
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode("update").option("checkpointLocation", s"$dir/cp").start()
    mem.addData((d30 + 60, "view", 1.0), (d30 + 120, "view", 2.0),
      (d30 + 3660, "view", 4.0), (d30 + 90, "click", 8.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_counts")
      .select(unix_timestamp(col("window_start")).as("w"), col("metric"), col("n"), col("vsum"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows((d30, "view")) == ((2L, 3.0)))
    assert(rows((d30 + 3600, "view")) == ((1L, 4.0)))
    assert(rows((d30, "click")) == ((1L, 8.0)))
  }

  test("events older than the watermark are dropped, never re-aggregated") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val d30 = 1706572800L
    val stream = mem.toDF().toDF("es", "metric", "value")
      .withColumn("ts", timestamp_seconds(col("es")))
    val agg = graft.streaming.StreamingIngest.windowedCounts(
      stream, "ts", "metric", "1 hour", "10 minutes")
    val dir = Files.createTempDirectory("late").toString
    val q = agg.writeStream.format("memory").queryName("late_counts")
      .outputMode("update").option("checkpointLocation", s"$dir/cp").start()
    mem.addData((d30 + 60, "view", 1.0))
    q.processAllAvailable() // max event time d30+60
    mem.addData((d30 + 7260, "view", 5.0))
    q.processAllAvailable() // watermark advances to d30+6660, window W0 closed
    // a straggler 2h inside the closed window: the engine must filter it
    // BEFORE aggregation (the reference design hands this case to repair)
    mem.addData((d30 + 120, "view", 100.0))
    q.processAllAvailable()
    q.stop()
    val w0 = spark.table("late_counts")
      .select(unix_timestamp(col("window_start")).as("w"), col("n"), col("vsum"))
      .filter(col("w") === d30).collect()
    assert(w0.nonEmpty)
    // every emitted update for W0 reflects only the on-time event
    assert(w0.forall(r => r.getLong(1) == 1L && r.getDouble(2) == 1.0))
  }

  test("watermarked dropDuplicates removes replayed events exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val d30 = 1706572800L
    val stream = mem.toDF().toDF("event_id", "es", "value")
      .withColumn("ts", timestamp_seconds(col("es")))
    val dd = StreamingIngest.withDedup(stream, "ts", "10 minutes", Seq("event_id"))
    val dir = Files.createTempDirectory("sdedup").toString
    val q = dd.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").option("checkpointLocation", s"$dir/cp").start()
    // batch 1: an in-batch duplicate plus a distinct event
    mem.addData((1L, d30, 1.0), (1L, d30, 1.0), (2L, d30 + 1, 2.0))
    q.processAllAvailable()
    // batch 2: a cross-batch replay (inside the watermark) plus new data
    mem.addData((1L, d30, 1.0), (3L, d30 + 5, 3.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 2L, 3L)) // each event exactly once
  }

  test("stream-stream interval join buffers one side in state across batches") {
    // the conversion_pairs_stream gate runs both sides in ONE AvailableNow
    // batch; this spec proves the property that gate cannot: a view whose
    // purchase arrives in a LATER micro-batch still pairs, because the
    // symmetric hash join buffers the unmatched side in the state store
    implicit val sqlCtx = spark.sqlContext
    val vm = MemoryStream[(Long, Long)]
    val pm = MemoryStream[(Long, Long, Double)]
    val views = vm.toDF().toDF("uid_v", "e_v")
      .withColumn("ts_v", timestamp_seconds(col("e_v")))
      .withWatermark("ts_v", "30 minutes")
    val purchases = pm.toDF().toDF("uid_p", "e_p", "v_p")
      .withColumn("ts_p", timestamp_seconds(col("e_p")))
      .withWatermark("ts_p", "30 minutes")
    val joined = views.join(purchases,
        col("uid_v") === col("uid_p") &&
        col("ts_p") >= col("ts_v") &&
        col("ts_p") < col("ts_v") + expr("INTERVAL 30 MINUTES"))
      .select(col("uid_v").as("user_id"), col("e_v"), col("e_p"), col("v_p"))
    val dir = Files.createTempDirectory("convjoin").toString
    val q = joined.writeStream.format("memory").queryName("conv_pairs")
      .outputMode("append").option("checkpointLocation", s"$dir/cp").start()
    val t0 = 1706572800L
    vm.addData((1L, t0), (2L, t0 + 60))
    q.processAllAvailable()
    // no purchases yet: nothing emits, the views sit in join state
    assert(spark.table("conv_pairs").count() == 0)
    // batch 2: user 1 converts inside the window, user 2 outside it
    pm.addData((1L, t0 + 600, 9.5), (2L, t0 + 7200, 1.0))
    q.processAllAvailable()
    val got = spark.table("conv_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, t0, t0 + 600)))
    // the pairing engine is the stateful symmetric hash join, not a
    // batch join that happened to see both sides
    assert(q.lastProgress.stateOperators.exists(op =>
      op.operatorName.contains("symmetricHashJoin") && op.numRowsTotal > 0))
    q.stop()
  }

  test("stream-stream join state survives a restart: recovered views still pair") {
    // the crash-recovery contract for the two-sided join: kill the query
    // after one side is buffered but unmatched, restart on the SAME
    // checkpoint, and the other side arriving post-restart must still
    // pair — possible only if the symmetric hash join's state store was
    // recovered; and the pre-crash emission must not repeat
    val dir = Files.createTempDirectory("convrec")
    val vIn = s"$dir/vin"; val pIn = s"$dir/pin"
    val outP = s"$dir/out"; val cp = s"$dir/cp"
    Files.createDirectories(java.nio.file.Paths.get(vIn))
    Files.createDirectories(java.nio.file.Paths.get(pIn))
    val t0 = 1706572800L
    def feedV(rows: (Long, Long)*): Unit =
      rows.toSeq.toDF("user_id", "e").repartition(1)
        .write.mode("append").parquet(vIn)
    def feedP(rows: (Long, Long, Double)*): Unit =
      rows.toSeq.toDF("user_id", "e", "value").repartition(1)
        .write.mode("append").parquet(pIn)
    def startQ() = {
      val views = spark.readStream.schema("user_id LONG, e LONG")
        .parquet(vIn)
        .select(col("user_id").as("uid_v"), col("e").as("e_v"),
          timestamp_seconds(col("e")).as("ts_v"))
        .withWatermark("ts_v", "30 minutes")
      val purchases = spark.readStream
        .schema("user_id LONG, e LONG, value DOUBLE").parquet(pIn)
        .select(col("user_id").as("uid_p"), col("e").as("e_p"),
          col("value").as("v_p"), timestamp_seconds(col("e")).as("ts_p"))
        .withWatermark("ts_p", "30 minutes")
      views.join(purchases,
          col("uid_v") === col("uid_p") &&
          col("ts_p") >= col("ts_v") &&
          col("ts_p") < col("ts_v") + expr("INTERVAL 30 MINUTES"))
        .select(col("uid_v").as("user_id"), col("e_v"), col("e_p"),
          col("v_p"))
        .writeStream.format("parquet").option("path", outP)
        .option("checkpointLocation", cp).outputMode("append").start()
    }
    // run 1: two views, one purchase — user 1 pairs, user 2's view is
    // buffered unmatched
    feedV((1L, t0), (2L, t0 + 60))
    feedP((1L, t0 + 600, 9.5))
    val q1 = startQ(); q1.processAllAvailable(); q1.stop() // "crash"
    val r1 = spark.read.parquet(outP).select("user_id", "e_v", "e_p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(r1 == Seq((1L, t0, t0 + 600)), s"run 1: $r1")
    // run 2, same checkpoint: user 2's purchase arrives only now — it
    // can pair only against the RECOVERED view state
    feedP((2L, t0 + 900, 4.0))
    val q2 = startQ(); q2.processAllAvailable(); q2.stop()
    val all = spark.read.parquet(outP).select("user_id", "e_v", "e_p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(all.count(_ == ((1L, t0, t0 + 600))) == 1,
      s"pre-crash pair re-emitted: $all") // exactly-once
    assert(all.toSet == Set((1L, t0, t0 + 600), (2L, t0 + 60, t0 + 900)),
      s"recovered-state pair missing: $all")
  }

  test("foreachBatch lands micro-batches idempotently in the fact table") {
    val base = Files.createTempDirectory("stream").toString
    val path = s"$base/fact"

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val d30 = 1706572800L // 2024-01-30 00:00:00Z
    mem.addData(
      Ev(1, d30 + 10, 7, "view", 1.5), Ev(2, d30 + 20, 8, "click", 2.5),
      Ev(3, d30 + 86410, 7, "view", 3.5)) // next day

    val q1 = StreamingIngest.start(mem.toDF(), transform, path, s"$base/cp1")
    q1.awaitTermination(60000)
    val t1 = spark.read.parquet(path)
    assert(t1.count() == 3)
    assert(t1.select("collect_date").distinct().count() == 2) // partitioned by day

    // replay the same data through a fresh checkpoint: the dynamic
    // partition overwrite converges instead of duplicating
    val mem2 = MemoryStream[Ev]
    mem2.addData(
      Ev(1, d30 + 10, 7, "view", 1.5), Ev(2, d30 + 20, 8, "click", 2.5),
      Ev(3, d30 + 86410, 7, "view", 3.5))
    val q2 = StreamingIngest.start(mem2.toDF(), transform, path, s"$base/cp2")
    q2.awaitTermination(60000)
    assert(spark.read.parquet(path).count() == 3) // unchanged, not 6
  }

  test("multiplexed stream consumer aggregates the gate's own artifact") {
    // the round-16 stream-floor protocol: conversion_rate_stream rides
    // conv_outer_stream's session artifact instead of running its own
    // stream. Pin (1) the consumer's aggregate equals a direct batch
    // aggregate of the artifact rows, and (2) gate output and artifact
    // are the same relation (the gate's first run donates it).
    val sf = "/root/testdata/sf0.001"
    val gate = graft.queries.AnalyticsQueries.convOuterStream(spark, sf)
    val art = graft.queries.AnalyticsQueries.convOuterArtifact(spark, sf)
    assert(gate.count() == art.count())
    val rate = graft.queries.AnalyticsQueries
      .conversionRateStream(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val direct = art.groupBy(col("user_id"))
      .agg(countDistinct(col("e_v")).as("nv"),
        countDistinct(when(col("e_p").isNotNull, col("e_v"))).as("nc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rate.nonEmpty && rate.toSeq == direct.toSeq)
  }
}
