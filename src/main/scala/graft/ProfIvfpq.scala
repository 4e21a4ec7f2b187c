package graft
object ProfIvfpq {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val sfDir = "/root/testdata/sf0.1"
    // warm
    SparkEntry.queries("ann_ivfpq_topk")(spark, sfDir).count()
    graft.ext.CacheScope.drain()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("ann_ivfpq_topk")(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      graft.ext.CacheScope.drain()
      println(f"IVFPQ build=${(t1-t0)/1e9}%.3f plan=${(t2-t1)/1e9}%.3f exec=${(t3-t2)/1e9}%.3f")
    }
    spark.stop()
  }
}
