package graft

/** Distributed-determinism gate: a query's RESULT must not depend on
  * how the cluster happened to partition it — the property every
  * integer-exact design choice in this engine exists to buy (quantized
  * dot products, md5 ranks, decimal-routed sums), and the one that
  * makes a 1000-executor run reproducible. Each probe runs the same
  * registered query in a second session configured with a DIFFERENT
  * shuffle-partition count (5 vs the test session's default): plans
  * and task boundaries change, collected results must be identical.
  * The statement cache and every session-state memo key on the
  * session, so the second session builds its own state from scratch —
  * this also re-proves the fixture functions are pure.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // a cross-section of aggregation shapes: iterative trainer, windowed
  // sketch, rational-score rank, mergeable-summary recount, hash-group
  private val probes = Seq("emb_kmeans_full", "quantile_sketch_grouped",
    "bm25_topk", "heavy_hitters", "dedup_exact", "m4_downsample")

  private def rows(s: org.apache.spark.sql.SparkSession, name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(s, sf)
    val cols = df.columns.sorted
    df.selectExpr(cols: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
  }

  test("results are identical under a different shuffle-partition count") {
    val other = spark.newSession()
    other.conf.set("spark.sql.shuffle.partitions", "5")
    try {
      probes.foreach { name =>
        val a = rows(spark, name)
        val b = rows(other, name)
        assert(a == b,
          s"$name diverged under 5 shuffle partitions: " +
            s"${a.size} vs ${b.size} rows; first diff: " +
            a.zip(b).find { case (x, y) => x != y }
              .orElse(Some((a.drop(b.size).headOption.getOrElse(""),
                b.drop(a.size).headOption.getOrElse("")))))
        graft.ext.CacheScope.drain()
      }
    } finally other.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
  }
}
