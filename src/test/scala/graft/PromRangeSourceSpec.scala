package graft

import org.apache.spark.sql.DataFrame
import graft.sources.PromRangeSource

class PromRangeSourceSpec extends SparkSpec {

  private def load(start: Long, end: Long, step: Long = 60,
      series: Long = 3, slice: Long = 3600): DataFrame =
    spark.read.format(classOf[PromRangeSource].getName)
      .option("metric", "up").option("start", start).option("end", end)
      .option("step", step).option("series", series).option("slice", slice)
      .load()

  test("plans one partition per time slice and generates the step grid") {
    val df = load(0, 4 * 3600 - 1) // 4 hours, 1h slices
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 4 * 60 * 3) // 60 ticks/hour x 3 series
    val r = df.filter("series_id = 1 AND e = 120").collect()
    assert(r.length == 1)
    assert(r(0).getDouble(3) == PromRangeSource.sample("up", 1, 120))
  }

  test("time-bound pushdown narrows the planned partitions") {
    import org.apache.spark.sql.functions.col
    val df = load(0, 24 * 3600 - 1) // 24 one-hour slices
    val narrowed = df.filter(col("e") >= 7200L && col("e") < 10800L)
    assert(narrowed.rdd.getNumPartitions == 1, "pushdown must reach planning")
    assert(narrowed.count() == 60 * 3)
    // the scan itself reports the narrowed range
    val scanDesc = narrowed.queryExecution.executedPlan.toString
    assert(scanDesc.contains("e=[7200,10799]"), scanDesc.take(600))
  }

  test("series equality pushdown drops the other series at the source") {
    import org.apache.spark.sql.functions.col
    val df = load(0, 3600 - 1).filter(col("series_id") === 2L)
    assert(df.count() == 60)
    assert(df.queryExecution.executedPlan.toString.contains("series=2"))
  }

  test("contradictory bounds plan zero partitions") {
    import org.apache.spark.sql.functions.col
    val df = load(0, 3600).filter(col("e") > 7200L)
    assert(df.count() == 0)
  }

  test("pushed series_id outside [0, numSeries) yields the empty scan") {
    import org.apache.spark.sql.functions.col
    // Spark trusts a fully-pushed filter and never re-checks it, so the
    // source must not fabricate rows for a series it doesn't have
    assert(load(0, 3600 - 1, series = 5)
      .filter(col("series_id") === 99L).count() == 0)
    assert(load(0, 3600 - 1, series = 5)
      .filter(col("series_id") === -1L).count() == 0)
    // boundary: numSeries itself is out of domain (ids are 0-based)
    assert(load(0, 3600 - 1, series = 5)
      .filter(col("series_id") === 5L).count() == 0)
    assert(load(0, 3600 - 1, series = 5)
      .filter(col("series_id") === 4L).count() == 60)
  }

  test("conflicting pushed series equalities yield the empty scan") {
    import org.apache.spark.sql.functions.col
    val df = load(0, 3600 - 1, series = 5)
      .filter(col("series_id") === 1L && col("series_id") === 2L)
    assert(df.count() == 0)
  }
}
