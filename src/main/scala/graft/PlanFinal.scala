package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run named queries to completion and print the POST-AQE
  * executed plan (what actually ran, including ReusedExchange /
  * AQEShuffleRead nodes) — `explain` before execution only shows the
  * initial plan when AQE is on (optimization guide §7.2).
  * Usage: runMain graft.PlanFinal name1 name2 ... (env SPARK_GRAFT_SF_DIR)
  */
object PlanFinal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm: session artifacts + codegen
      graft.ext.CacheScope.drain()
      val df = fn(spark, sfDir)
      // execute THIS QueryExecution (count() would spawn a fresh one and
      // leave df's adaptive plan un-finalized)
      val qe = df.queryExecution
      qe.toRdd.count()
      println(s"===== $name (executed, post-AQE)")
      println(qe.executedPlan.toString)
      graft.ext.CacheScope.drain()
    }
    spark.stop()
  }
}
