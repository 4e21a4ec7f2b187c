package graft

/** The SQL surface: reference-style read-side SQL runs verbatim against
  * the registered views (the user-guide's queries, adapted only for the
  * fixture label names).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views serve reference-style SQL") {
    SparkEntry.registerViews(spark, "/root/testdata/sf0.001")
    // label extraction + day bucketing + aggregation (user-guide.md:219-347)
    val daily = spark.sql(
      """SELECT date(collected_at) AS d, labels['user'] AS node,
        |       count(*) AS n, round(sum(value), 3) AS total
        |FROM metrics WHERE metric_name = 'view'
        |GROUP BY 1, 2 ORDER BY d DESC, node LIMIT 10""".stripMargin)
    assert(daily.count() > 0)
    // the native extension function is available in SQL via GraftSession
    org.apache.spark.sql.graftbridge.ColumnBridge.registerFunction(
      spark, "graft_dotq", graft.functions.DotProductQ.info,
      graft.functions.DotProductQ.builder)
    val knn = spark.sql(
      """SELECT a.vec_id, graft_dotq(
        |         transform(a.embedding, x -> CAST(floor(x*1000000 + 0.5) AS BIGINT)),
        |         transform(a.embedding, x -> CAST(floor(x*1000000 + 0.5) AS BIGINT))
        |       ) AS norm_sq
        |FROM embeddings a LIMIT 5""".stripMargin)
    assert(knn.collect().forall(_.getLong(1) > 0))
  }
}
