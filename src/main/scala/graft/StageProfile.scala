package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev profiler: run named queries Bench-style (warm pass, then timed
  * steady-state runs) with a SparkListener recording per-job and
  * per-stage wall/task time. Attributes a query's steady-state seconds
  * to scheduler round-trips (many small jobs/stages) vs executor
  * compute (task time) — the triage the optimization guide's §1 asks
  * for before touching any plan.
  *
  * Usage: runMain graft.StageProfile name1 name2 ...
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as Bench.
  */
object StageProfile {

  private class Rec extends SparkListener {
    case class Stage(id: Int, name: String, tasks: Int, taskTimeMs: Long,
      wallMs: Long, shuffleReadB: Long, shuffleWriteB: Long, recsOut: Long)
    val stages = new scala.collection.mutable.ArrayBuffer[Stage]
    var jobs = 0
    @volatile var enabled = false
    override def onJobStart(j: SparkListenerJobStart): Unit =
      if (enabled) jobs += 1
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      if (enabled) {
        val si = sc.stageInfo
        val wall = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        val m = si.taskMetrics
        stages += Stage(si.stageId, si.name.takeWhile(_ != '\n').take(60),
          si.numTasks, m.executorRunTime, wall.getOrElse(-1L),
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.outputMetrics.recordsWritten)
      }
    def reset(): Unit = { stages.clear(); jobs = 0 }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val rec = new Rec
    spark.sparkContext.addSparkListener(rec)
    val sel = SparkEntry.queries.filter { case (n, _) => args.contains(n) }
      .toSeq.sortBy(_._1)
    // Bench-identical warm pass (codegen + session artifacts)
    sel.foreach { case (_, fn) =>
      fn(spark, sfDir).count(); graft.ext.CacheScope.drain() }
    sel.foreach { case (name, fn) =>
      // one extra untimed run so the profiled run is true steady state
      fn(spark, sfDir).count(); graft.ext.CacheScope.drain()
      rec.reset(); rec.enabled = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      rec.enabled = false
      graft.ext.CacheScope.drain()
      // settle async listener events
      Thread.sleep(200)
      val st = rec.stages.sortBy(-_.wallMs)
      val taskSum = st.map(_.taskTimeMs).sum
      val wallSum = st.map(_.wallMs).sum
      println(f"PROF $name wall=$sec%.3f s jobs=${rec.jobs} " +
        f"stages=${st.size} stageWallSum=${wallSum / 1000.0}%.3f " +
        f"taskTimeSum=${taskSum / 1000.0}%.3f")
      st.take(12).foreach { s =>
        println(f"  stage ${s.id}%5d wall=${s.wallMs}%5d ms tasks=${s.tasks}%3d " +
          f"task=${s.taskTimeMs}%6d ms sr=${s.shuffleReadB}%8d sw=${s.shuffleWriteB}%8d ${s.name}")
      }
    }
    spark.stop()
  }
}
