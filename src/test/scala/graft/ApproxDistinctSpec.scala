package graft

import org.apache.spark.sql.functions._

/** Error-bound gate for the one registered query that has no DuckDB
  * oracle by nature (`approx_distinct_users` — HLL register layouts are
  * engine-specific, so cross-engine value equality is meaningless).
  * HLL++ with relative standard deviation `rsd` carries a standard
  * error of rsd·n; the estimate is DETERMINISTIC for fixed input, so
  * asserting |est − exact| ≤ 2·rsd·exact on the fixtures pins a fixed
  * fact, not a flaky probability — and a >2σ deviation on uniform-ish
  * user ids would mean the sketch (or our wiring of it) broke.
  */
class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  private val rsd = 0.02

  test("approx_distinct_users: every metric within 2·rsd of exact") {
    val rows = graft.queries.ExtQueries
      .approxDistinct(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(est - exact) <= 2 * rsd * exact,
        s"metric ${r.getAs[String]("metric")}: est $est vs exact $exact " +
          s"exceeds the 2·rsd bound (${2 * rsd * exact})")
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
