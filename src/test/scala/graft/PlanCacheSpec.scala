package graft

/** Contract gates for the round-9 steady-state machinery: the statement
  * cache (TableCache.planCachedPack) and the parallelism floor
  * (Parallelism.widen). These pin the properties the Bench numbers rely
  * on — pure entries serve ONE memoized plan per (session, query,
  * dataset) and are never result-cached; impure entries (stream gates,
  * CacheScope-scratch builders) rebuild on every call so their timings
  * keep measuring real work; the widen guard fires only on scans
  * narrower than the floor.
  */
class PlanCacheSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pure entries serve the same prepared plan in a fresh frame per call") {
    for (name <- Seq("promql_parsed_deriv", "pricing_summary", "gopher_rules",
        "window_yesterday", "m4_downsample")) {
      val f = SparkEntry.queries(name)
      val a = f(spark, sf)
      val b = f(spark, sf)
      // the statement cache stores the OPTIMIZED logical plan — both
      // calls must serve the identical plan instance (no re-analysis,
      // no re-optimization) ...
      assert(a.queryExecution.logical eq b.queryExecution.logical,
        s"$name should serve one prepared (optimized) plan per session")
      // ... wrapped in a NEW Dataset each call: a memoized Dataset
      // would re-serve its first run's shuffle outputs and the bench
      // would measure nothing
      assert(!(a eq b),
        s"$name must wrap the prepared plan in a fresh frame per call")
    }
  }

  test("memoized plans are not result-cached: storage level stays NONE") {
    // the statement cache serves the COMPILED plan; every action must
    // still recompute from base tables — a persisted frame here would
    // mean Bench timings measure cache reads, not compute
    val df = SparkEntry.queries("promql_parsed_deriv")(spark, sf)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val n1 = df.count()
    graft.ext.CacheScope.drain()
    assert(df.count() == n1)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("the cache keys on the dataset: no cross-sf plan leakage") {
    val f = SparkEntry.queries("window_yesterday")
    val a = f(spark, "/root/testdata/sf0.001")
    val b = f(spark, "/root/testdata/sf0.01")
    assert(!(a.queryExecution.logical eq b.queryExecution.logical),
      "different datasets must get different prepared plans")
    // and each plan computes ITS dataset: sf0.01 has 10x the events
    assert(b.agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0) >
      a.agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0))
  }

  test("exempt impure builders rebuild per call") {
    // dedup_groups (CacheScope-registered CC output) and a stream gate —
    // NOT ngram_jaccard: building (without executing) its session pair
    // frame here would seed the shared shingle state in a different
    // order than the harness does, perturbing PlanShapeSpec's
    // cache-reuse assertion on the very plan this suite isn't about
    for (name <- Seq("dedup_groups", "hourly_avg_stream")) {
      val f = SparkEntry.queries(name)
      val a = f(spark, sf)
      val b = f(spark, sf)
      assert(!(a eq b),
        s"$name is statement-cache-exempt and must rebuild on every call")
    }
    graft.ext.CacheScope.drain()
  }

  test("widen floors a narrow frame and leaves a wide one untouched") {
    val narrow = spark.range(100).toDF("id").coalesce(1)
    val widened = graft.ext.Parallelism.widen(narrow)
    val floor = math.min(16, spark.sparkContext.defaultParallelism)
    assert(widened.rdd.getNumPartitions >= floor)
    assert(widened.count() == 100)
    val wide = spark.range(100).toDF("id")
      .repartition(math.max(floor, spark.sparkContext.defaultParallelism))
    assert(graft.ext.Parallelism.widen(wide) eq wide,
      "an already-wide frame must pass through without a new shuffle")
  }
}
