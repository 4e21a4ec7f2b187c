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

  // one probe per pack family (round 12: widened from 6 so the gate is
  // evidence across the surface, not a fixed corner) — each family's
  // most partition-sensitive aggregation shape. Budget: ~2 s/probe net
  // (per-probe walls printed as info lines); the first probe also
  // absorbs ~7 s of cold-session warmup when the suite runs standalone,
  // already paid when it runs inside the full `sbt test` JVM.
  private val probes = Seq(
    "emb_kmeans_step",         // trainer assign step (argmin aggregate;
                               // the full 3-round trainer costs ~11 s
                               // across two cold sessions — the shape
                               // this gate needs is the argmin, and
                               // KmeansConvergenceSpec covers the
                               // iterated run's determinism signals)
    "quantile_sketch_grouped", // windowed mergeable sketch
    "bm25_topk",               // rational-score global rank
    "heavy_hitters",           // per-partition summaries + recount
    "dedup_exact",             // hash-group dedup
    "m4_downsample",           // struct min/max boundary aggregation
    "promql_parsed_histq",     // deep parsed-PromQL plan (histogram_quantile)
    "pq_range_rate",           // range-grid window explode + per-point rate
    "gpu_daily_report",        // two-level nested SQL aggregation
    "asof_join",               // ordered as-of join
    "domain_cap",              // salted two-phase top-N (skew path)
    "dedup_minhash_lsh",       // banded LSH pair generation
    "bpe_encode_stats",        // round 13's native-aggregate family:
                               // trainer aggregate (partial-map merge
                               // order varies with partitioning) +
                               // corpus (lang, word) shuffle +
                               // vocab-sized broadcast join
    "ann_ivfpq_trained",       // round 14's layered-artifact serving
                               // path: k-means cells + PQ codes +
                               // their cell-keyed join all rebuilt
                               // from scratch in the second session,
                               // then ADC ranked (integer ties →
                               // vec_id tie-break)
    "ann_ivfpq_residual",      // round 15: the residual twin — adds
                               // the centroid join + residual encode
                               // to the rebuilt artifact chain
    "emb_recall_residual",     // and its recall audit (brute-force
                               // join + left-join fill both reorder
                               // freely with partitioning)
    "dedup_keep_best")         // min(struct) argmax over the CC
                               // component memo (iteration order and
                               // partial-combine order both vary with
                               // partitioning)

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
        val t0 = System.nanoTime()
        val a = rows(spark, name)
        val b = rows(other, name)
        info(f"$name%-26s ${(System.nanoTime()-t0)/1e9}%.2f s")
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
