package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.Exchange

/** Dev probe: for named queries, group the pre-AQE physical plan's
  * Exchange nodes by canonicalized plan and report duplicate groups —
  * duplicates that AQE's stage cache should collapse into one executed
  * stage. A duplicate group that still runs twice (per StageProfile)
  * means exchange reuse is broken for that shape.
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    for (name <- args.filter(SparkEntry.queries.contains)) {
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      // executedPlan, not sparkPlan: Exchange nodes are inserted by the
      // EnsureRequirements preparation rule (run with GRAFT_AQE=false so
      // the tree holds plain Exchanges rather than an adaptive wrapper)
      val phys = df.queryExecution.executedPlan
      val ex = phys.collect { case e: Exchange => e }
      val reused = phys.collect {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r }
      val groups = ex.groupBy(_.canonicalized)
      println(s"===== $name: ${ex.size} exchanges, ${groups.size} canonical groups, " +
        s"${reused.size} ReusedExchange")
      // dump each shuffle exchange's canonicalized subtree for diffing
      val shuffles = ex.filter(_.nodeName == "Exchange")
      shuffles.zipWithIndex.foreach { case (e, i) =>
        val p = java.nio.file.Paths.get(s"/tmp/reuseprobe_${name}_ex$i.txt")
        java.nio.file.Files.writeString(p, e.canonicalized.toString)
        println(s"  wrote $p (${e.simpleString(100).take(120)})")
      }
      // structural bisect: first differing node between two subtrees
      def firstDiff(a: org.apache.spark.sql.execution.SparkPlan,
          b: org.apache.spark.sql.execution.SparkPlan, path: String): Unit = {
        if (a == b) return
        if (a.getClass != b.getClass) {
          println(s"  DIFF at $path: class ${a.getClass.getSimpleName} vs ${b.getClass.getSimpleName}")
          return
        }
        val selfDiff = a.children.size == b.children.size &&
          a.children.zip(b.children).forall { case (x, y) => x == y }
        if (selfDiff) {
          println(s"  DIFF at $path: node ${a.getClass.getSimpleName} itself differs")
          a.productIterator.zip(b.productIterator).zipWithIndex.foreach {
            case ((x, y), i) if x != y =>
              println(s"    arg$i: ${String.valueOf(x).take(200)}")
              println(s"      vs: ${String.valueOf(y).take(200)}")
            case _ =>
          }
        } else {
          a.children.zip(b.children).zipWithIndex.foreach { case ((x, y), i) =>
            firstDiff(x, y, s"$path/$i:${x.getClass.getSimpleName}")
          }
          if (a.children.size != b.children.size)
            println(s"  DIFF at $path: child count ${a.children.size} vs ${b.children.size}")
        }
      }
      if (args.length > 1 && shuffles.size > args(1).toInt.max(args(2).toInt)) {
        firstDiff(shuffles(args(1).toInt).canonicalized,
          shuffles(args(2).toInt).canonicalized, "root")
      }
      graft.ext.CacheScope.drain()
    }
    spark.stop()
  }
}
