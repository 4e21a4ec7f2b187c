package graft

import org.apache.spark.sql.functions._
import graft.promql.PromOps

/** Property check: the distributed quantile_over_time equals a direct
  * in-memory computation of Prometheus's rank rule (rank = q·(n−1),
  * linear interpolation between the floor and ceil order statistics) on
  * seeded random series — including the n = 1 and all-equal edge cases.
  */
class QuantilePropertySpec extends SparkSpec {
  import spark.implicits._

  private def reference(values: Seq[Double], q: Double): Double = {
    val v = values.sorted.toIndexedSeq
    val rank = q * (v.size - 1)
    val lo = v(math.floor(rank).toInt)
    val hi = v(math.ceil(rank).toInt)
    lo + (hi - lo) * (rank - math.floor(rank))
  }

  test("quantileOverTime == rank-rule reference on seeded random series") {
    val rnd = new scala.util.Random(42)
    // 20 series with 1..40 samples each; values include repeats
    val rows = (0 until 20).flatMap { s =>
      val n = 1 + rnd.nextInt(40)
      (0 until n).map { i =>
        ("m", Map("s" -> s.toString),
          math.floor(rnd.nextDouble() * 50) / 2.0, // repeats likely
          (900 + i).toLong)
      }
    }
    val df = rows.toDF("metric_name", "labels", "value", "es")
      .withColumn("timestamp", timestamp_seconds(col("es")))
    val byKey = rows.groupBy(r => r._2("s")).view.mapValues(_.map(_._3)).toMap
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)) {
      val rs = PromOps.rangeSelector(df, "m", 1000L, 200L)
      val got = PromOps.quantileOverTime(rs, q)
        .collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      byKey.foreach { case (s, vals) =>
        val key = s"""{"s":"$s"}"""
        assert(got(key) == reference(vals, q),
          s"q=$q series=$s: got ${got(key)}, want ${reference(vals, q)}")
      }
    }
  }

  test("quantile_sketch rank error within the DKW bound at k=1024") {
    // DKW: sup |F_sample - F| <= sqrt(ln(2/delta)/(2k)) with prob 1-delta;
    // at k=1024, delta=0.05 that is 0.0425. The md5 rank is a fixed hash,
    // so this is a deterministic regression gate, not a flaky sample.
    val sf = "/root/testdata/sf0.001"
    val est = SparkEntry.queries("quantile_sketch")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val full = graft.ingest.EventsIngest.readEvents(spark, sf)
      .select(col("value")).as[Double].collect().sorted
    val n = full.length
    est.foreach { case (p, v) =>
      // the estimate's true cdf interval [P(X < v), P(X <= v)] (ties give
      // it width) must intersect p/100 ± the bound
      val lo = full.count(_ < v).toDouble / n
      val hi = full.count(_ <= v).toDouble / n
      val eps = 0.0425 + 1.0 / n
      assert(hi >= p / 100.0 - eps && lo <= p / 100.0 + eps,
        s"p=$p est=$v cdf=[$lo,$hi] n=$n")
    }
  }

  test("quantile_sketch_grouped: same DKW bound per group, exact when unsaturated") {
    // the grouped sketch's contract is the global one applied per
    // (series, day): a group that saturates its 1024-row sample carries
    // the DKW rank bound; a group under 1024 rows IS its own sample, so
    // rank selection there must be exact (eps collapses to tie-width)
    val sf = "/root/testdata/sf0.001"
    val est = SparkEntry.queries("quantile_sketch_grouped")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getInt(2)) ->
        r.getDouble(3)).toMap
    val byGroup = graft.ingest.EventsIngest.readEvents(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value"))
      .as[(String, String, Double)].collect()
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sorted).toMap
    assert(est.nonEmpty)
    est.foreach { case ((series, day, p), v) =>
      val full = byGroup((series, day))
      val n = full.length
      val lo = full.count(_ < v).toDouble / n
      val hi = full.count(_ <= v).toDouble / n
      val eps = (if (n > 1024) 0.0425 else 0.0) + 1.0 / n
      assert(hi >= p / 100.0 - eps && lo <= p / 100.0 + eps,
        s"series=$series day=$day p=$p est=$v cdf=[$lo,$hi] n=$n")
    }
    // monotone within each group: p50 <= p95 <= p99
    est.keys.map(k => (k._1, k._2)).toSeq.distinct.foreach { case (s, d) =>
      assert(est((s, d, 50)) <= est((s, d, 95)) &&
        est((s, d, 95)) <= est((s, d, 99)))
    }
  }
}
