package graft
import org.apache.spark.sql.SparkSession

/** Dev profiler: run one registered query N times and print per-iteration
  * seconds — separates one-time cost (codegen, first scan) from steady
  * state. Usage: runMain graft.BenchOne <queryName> [iters] [sfDir]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: BenchOne <queryName> [iters] [sfDir]\navailable: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val sfDir =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val fnOpt = SparkEntry.queries.get(name)
    if (fnOpt.isEmpty) {
      System.err.println(
        s"unknown query '$name'; available: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val spark = GraftSession.local(cpus)
    val fn = fnOpt.get
    (1 to iters).foreach { i =>
      spark.catalog.clearCache() // per-iter persists must not leak across
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"BENCHONE $name iter=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
