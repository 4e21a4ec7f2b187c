package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: runs one registered query N times against the target
  * sf and splits each run into Catalyst phase time (parsing/analysis/
  * optimization/planning, driver-side and single-threaded) vs execution,
  * so per-query steady-state cost can be attributed before optimizing.
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.Profile <query>[,<query>…] [runs]
  * (comma-separated names share one JVM/session, so profiling the top-10
  * costs one ~50 s sbt startup instead of ten)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(sys.error("usage: Profile <query>[,<query>…] [runs]"))
      .split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = graft.GraftSession.local(cpus)
    names.foreach { name => profileOne(spark, name, runs, sfDir) }
    spark.stop()
  }

  private def profileOne(spark: SparkSession, name: String, runs: Int, sfDir: String): Unit = {
    System.err.println(s"== PROFILE $name")
    val fn = graft.SparkEntry.queries(name)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    // removed at the end of this query's profile so a multi-query
    // invocation never stacks listeners (each would re-print every stage)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
        val si = s.stageInfo
        val dur = for { a <- si.submissionTime; b <- si.completionTime } yield b - a
        System.err.println(s"  stage ${si.stageId} tasks=${si.numTasks} wall=${dur.getOrElse(-1L)}ms ${si.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // warm codegen + session caches once, like Bench
    fn(spark, sfDir).count()
    graft.ext.CacheScope.drain()
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = System.nanoTime()
      // count() builds its own QueryExecution; time its phases separately
      val agg = df.groupBy().count()
      val qe = agg.queryExecution
      qe.executedPlan // forces analysis+optimization+physical planning
      val tPlan = System.nanoTime()
      jobs.set(0); stages.set(0); tasks.set(0)
      val n = agg.collect()(0).getLong(0)
      val tEnd = System.nanoTime()
      Thread.sleep(50) // let listener events drain
      System.err.println(s"RUN$i jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      val phases = qe.tracker.phases.toSeq.sortBy(_._1).map { case (p, s) =>
        f"$p=${s.durationMs}%dms"
      }.mkString(" ")
      System.err.println(
        f"RUN$i build=${(tBuild - t0) / 1e6}%.0fms plan=${(tPlan - tBuild) / 1e6}%.0fms " +
          f"exec=${(tEnd - tPlan) / 1e6}%.0fms total=${(tEnd - t0) / 1e9}%.3fs rows=$n phases: $phases")
      graft.ext.CacheScope.drain()
    }
    spark.sparkContext.removeSparkListener(listener)
  }
}
