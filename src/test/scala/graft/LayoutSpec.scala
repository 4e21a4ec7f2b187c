package graft

import org.apache.spark.sql.functions._
import graft.sources.FactLayout
import graft.ops.MetricsListener

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("identically-bucketed tables join with zero exchanges") {
    val a = (1L to 1000L).map(i => (i % 50, s"a$i")).toDF("user_id", "pa")
    val b = (1L to 1000L).map(i => (i % 50, s"b$i")).toDF("user_id", "pb")
    FactLayout.writeBucketed(a, "fact_a", "user_id", 8)
    FactLayout.writeBucketed(b, "fact_b", "user_id", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = FactLayout.colocatedJoin(spark, "fact_a", "fact_b", "user_id")
      assert(joined.count() == 20000) // 50 keys x 20 x 20
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected shuffle-free join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS fact_a")
      spark.sql("DROP TABLE IF EXISTS fact_b")
    }
  }

  test("O10: QueryExecutionListener records per-action metrics") {
    val listener = MetricsListener.install(spark)
    try {
      spark.range(100).filter(col("id") % 2 === 0).count()
      // listener events deliver asynchronously; poll briefly
      val deadline = System.currentTimeMillis() + 30000
      var metrics = listener.drain()
      while (metrics.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); metrics = listener.drain()
      }
      assert(metrics.nonEmpty)
      assert(metrics.forall(_.error.isEmpty))
      assert(metrics.exists(_.durationMs >= 0))
    } finally spark.listenerManager.unregister(listener)
  }
}
