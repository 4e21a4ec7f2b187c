package graft

/** Dev profiler for an arbitrary query subset: Bench-identical timing
  * (sf0.001 warmup for the named queries, fact-frame warm, min-of-2 with
  * CacheScope.drain() between runs) without paying a full 198-query
  * pass. Used to attribute regressions to a block and to A/B a plan
  * change in minutes instead of ten.
  * Usage: runMain graft.SubsetBench name1 name2 ...  (env SPARK_GRAFT_SF_DIR)
  */
object SubsetBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    val sel = SparkEntry.queries.filter { case (n, _) =>
      args.isEmpty || args.exists(a => n == a || n.startsWith(a)) }
      .toSeq.sortBy(_._1)
    // Bench-identical discipline: untimed warm pass at the TARGET sf
    // (codegen + session-scoped engine state), then two INTERLEAVED
    // timed passes (see Bench's scaladoc for why interleaved).
    sel.foreach { case (_, fn) =>
      fn(spark, sfDir).count(); graft.ext.CacheScope.drain() }
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.ext.CacheScope.drain()
      sec
    }
    val p1 = sel.map { case (name, fn) => name -> run(fn) }.toMap
    val p2 = sel.reverse.map { case (name, fn) => name -> run(fn) }.toMap
    val times = sel.map { case (name, _) =>
      val (r1, r2) = (p1(name), p2(name))
      println(f"SUBSETBENCH $name%-32s min=${math.min(r1, r2)}%.3f (r1=$r1%.3f r2=$r2%.3f)")
      name -> math.min(r1, r2)
    }
    println(f"SUBSETBENCH TOTAL ${times.map(_._2).sum}%.3f over ${times.size}")
    spark.stop()
  }
}
