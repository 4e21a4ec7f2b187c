package graft

import org.apache.spark.sql.functions._

/** Error-bound gate for the HLL sketch query. HLL register layouts are
  * engine-specific, so cross-engine equality of the ESTIMATE is
  * meaningless — instead `approx_distinct_users` registers the 2·rsd
  * error envelope as its checked contract (exact count, bound in basis
  * points, in-engine `within_bound` verdict; the DuckDB oracle asserts
  * the verdict TRUE, so an out-of-envelope estimate is a driver-visible
  * hash FAIL). HLL++ with relative standard deviation `rsd` carries a
  * standard error of rsd·n; the estimate is DETERMINISTIC for fixed
  * input, so the verdict pins a fixed fact, not a flaky probability —
  * a >2σ deviation on uniform-ish user ids would mean the sketch (or
  * our wiring of it) broke. This spec is the same gate one level
  * closer to the sketch, plus a cardinality two orders above the
  * fixture's that the fixtures cannot cover.
  */
class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  private val rsd = 0.02

  test("approx_distinct_users: every metric's within_bound verdict is true") {
    val rows = graft.queries.ExtQueries
      .approxDistinct(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("bound_bp") == (2 * rsd * 10000).toLong,
        s"metric ${r.getAs[String]("metric")}: unexpected bound_bp")
      assert(r.getAs[Boolean]("within_bound"),
        s"metric ${r.getAs[String]("metric")}: HLL estimate outside the " +
          s"2·rsd envelope of exact=${r.getAs[Long]("exact_users")}")
    }
  }

  test("HLL bound holds at a cardinality far above the fixture's") {
    // 200k distinct ids — two orders above the fixture, same 2·rsd gate
    val df = spark.range(200000)
      .select((col("id") % 4).as("g"), col("id"))
      .groupBy(col("g"))
      .agg(approx_count_distinct(col("id"), rsd).as("est"),
        countDistinct(col("id")).as("exact"))
      .collect()
    df.foreach { r =>
      val est = r.getAs[Long]("est").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(est - exact) <= 2 * rsd * exact,
        s"group ${r.getAs[Long]("g")}: $est vs $exact")
    }
  }
}
