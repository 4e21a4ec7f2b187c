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
    // the native BPE trainer aggregate, straight from SQL: 2 merges over
    // an inline vocabulary — "aaa"x3 merges (a,a) cnt 6 then (aa,a) cnt 3
    org.apache.spark.sql.graftbridge.ColumnBridge.registerFunction(
      spark, "graft_bpe_train", graft.functions.BpeTrainAgg.info,
      graft.functions.BpeTrainAgg.builder)
    val merges = spark.sql(
      """SELECT explode(graft_bpe_train(w, freq, 2)) AS m
        |FROM VALUES ('aaa', 3L) AS t(w, freq)""".stripMargin)
      .select("m.step", "m.pair_a", "m.pair_b", "m.cnt").collect()
    assert(merges.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq == Seq((1L, "a", "a", 6L), (2L, "aa", "a", 3L)))
  }
}
