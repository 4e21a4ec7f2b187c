package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B probe for the prepared-statement execution path: steady-state
  * `df.count()` on a rebuilt frame (today's bench action) vs the same
  * action on a frame re-created from the CACHED OPTIMIZED logical plan
  * (analysis + optimization paid once per session, physical planning and
  * execution fresh per run — fresh Exchange nodes, so no shuffle-output
  * reuse corrupts the measurement).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.PlanReuseProbe q1,q2 [runs]
  */
object PlanReuseProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(sys.error("usage: PlanReuseProbe <q,q,...> [runs]"))
      .split(",").toSeq
    val runs = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def steady(label: String, act: () => Long): Double = {
      act() // warm
      graft.ext.CacheScope.drain()
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        act()
        val s = (System.nanoTime() - t0) / 1e9
        graft.ext.CacheScope.drain()
        s
      }
      val best = ts.min
      System.err.println(f"  $label%-14s min=${best}%.3fs all=${ts.map(t => f"$t%.3f").mkString(",")}")
      best
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      System.err.println(s"== $name")
      val a = steady("count()", () => fn(spark, sfDir).count())
      val opt = fn(spark, sfDir).queryExecution.optimizedPlan
      val b = steady("ofRows(opt)", () =>
        org.apache.spark.sql.graft.PlanShim.ofRows(spark, opt).count())
      val c = steady("toRdd.count", () =>
        org.apache.spark.sql.graft.PlanShim.execute(spark, opt).toRdd.count())
      System.err.println(f"  saved: ofRows=${(a - b) * 1000}%.0fms toRdd=${(a - c) * 1000}%.0fms")
    }
    spark.stop()
  }
}
