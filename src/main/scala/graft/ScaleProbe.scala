package graft

import org.apache.spark.sql.functions._

/** Scale probe: amplifies the fixture tables N× into /tmp and times the
  * heavy operators warm at 1× and N×, so scaling claims in the README are
  * measured, not asserted. Documents amplify as EXACT COPIES with offset
  * ids — the adversarial case for dedup (duplicate-cluster size grows
  * N×); events amplify with offset user ids (N× more sessions/series,
  * per-user history unchanged).
  *
  * Usage: runMain graft.ScaleProbe [sfDir] [copies]
  */
object ScaleProbe {

  /** Amplify the base fixture tables `copies`× into `probeDir` as exact
    * copies with offset ids — shared by the CLI decade runs below and
    * ScaleProbeSpec's growth-class regression gate.
    */
  def amplify(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      probeDir: String, copies: Int): Unit = {
    val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until copies).map(i =>
        d0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000000L)))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$probeDir/documents.parquet")
    val e0 = spark.read.parquet(s"$sfDir/events.parquet")
    (0 until copies).map(i =>
        e0.withColumn("user_id", col("user_id") + lit(i.toLong * 100000L))
          .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L)))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$probeDir/events.parquet")
    val v0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (0 until copies).map(i =>
        v0.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000000L)))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$probeDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val probeDir = "/tmp/graft_probe"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    amplify(spark, sfDir, probeDir, copies)
    // adversarial hot-shingle corpus: every amplified document gains the
    // same trailing sentence, so one shingle's document frequency equals
    // its whole (lang,source) bucket — the exact stop-shingle skew key
    // Dedup.jaccardPairs' DfCap guards against. Uncapped pair generation
    // would emit Σ_bucket df² ≈ (docs/bucket)² join rows per bucket
    // (billions at 10×); with the cap the probe must stay near the
    // clean-corpus time because the hot key is dropped before any join.
    spark.read.parquet(s"$probeDir/documents.parquet")
      .withColumn("text",
        concat(col("text"), lit(" zq zq zq zq zq zq")))
      .write.mode("overwrite").parquet(s"$probeDir/hot/documents.parquet")
    // pathological single mega-cluster: EVERY document (all N× copies)
    // carries the same text, so exact-dedup must collapse the whole
    // corpus into one root before the near-dup machinery sees it — the
    // worst duplicate-cluster shape a crawl corpus can produce. The CC
    // stage then runs on ONE representative; a design that fed the full
    // cluster into banding/pair generation would blow up quadratically.
    spark.read.parquet(s"$probeDir/documents.parquet")
      .withColumn("text",
        lit("the same crawl page mirrored everywhere zz yy xx ww vv uu " +
          "tt ss rr qq pp oo nn mm ll kk jj ii hh gg"))
      .write.mode("overwrite").parquet(s"$probeDir/mega/documents.parquet")

    def time(name: String, dir: String, tag: String)(
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      fn(spark, dir).count() // warm: codegen + scans
      spark.catalog.clearCache()
      graft.ext.CacheScope.drain()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"PROBE $name%-14s $tag%4s rows=$n%-9d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
      graft.ext.CacheScope.drain()
    }

    // `heavy` (arg 3) restricts to the dedup family — the 30x-100x decade
    // runs take minutes on the full list, and the deep-amplification
    // question is specifically about candidate generation and CC
    val heavy = args.length > 2 && args(2) == "heavy"
    // `r8` (arg 3) restricts to the round-8 additions, so their decade
    // can be recorded without re-running the whole table
    val r8only = args.length > 2 && args(2) == "r8"
    // `r8b` (arg 3): the round-8 third batch (mergeable-summary heavy
    // hitters, incremental batch-vs-corpus dedup). Exact-copy
    // amplification is adversarial for BOTH: heavy_hitters sees N× the
    // token stream over an unchanged vocabulary (candidate set must stay
    // flat while counts scale), and dedup_incremental sees every
    // amplified copy become a genuine cross dup — band-collision groups
    // of size N, so candidate pairs grow with the real output, the one
    // growth a dedup can't avoid (upstream exact-dedup is the documented
    // production answer, as for the hot-shingle jaccard corpus).
    val r8bOnly = args.length > 2 && args(2) == "r8b"
    // `r8c` (arg 3): the round-8 retrieval/policy batch. Exact-copy
    // amplification is the interesting case for winnow_neardup: every
    // copy is a GENUINE near-dup, so fingerprint postings grow N× and
    // output pairs grow ~N² — real dup growth the ≤64-df cap bounds per
    // posting (base-df>2 fingerprints drop out at 30×, exactly the
    // upstream-exact-dedup division of labor the jaccard hot probe
    // documents). bm25/dsir see N× the token stream over an unchanged
    // vocabulary/bucket space (broadcast frames constant, shuffles
    // linear); ivfpq sees N× vectors per cell at a fixed cell count.
    val r8cOnly = args.length > 2 && args(2) == "r8c"
    // `r8d` (arg 3): the round-8 scoring/versioning batch. Exact-copy
    // amplification keeps the distinct-gram space CONSTANT while the
    // occurrence stream grows N× — lm_predictability's count tables must
    // stay vocabulary-sized (the per-gram counts scale, the ratios
    // don't), so its time tracks the token stream, linear. snapshot_diff
    // sees N× both snapshots with churn a fixed fraction of ids: the
    // full-outer join is linear and output stays churn-bound.
    val r8dOnly = args.length > 2 && args(2) == "r8d"
    // `r8e` (arg 3): the graph/sketch/diversity tail. Exact-copy
    // amplification grows the near-dup edge set ~N·dups (every copy is
    // a genuine neighbor), so pagerank_step's joins track edges — the
    // real output growth, like winnow_neardup. char_diversity tracks
    // the char stream (map-side, alphabet-sized histograms).
    // kmv_intersect must stay FLAT: sketches are k-row frames whatever
    // the corpus, and only the exact-truth column touches the
    // (distinct-bounded) user relation.
    val r8eOnly = args.length > 2 && args(2) == "r8e"
    for ((dir, tag) <- Seq((sfDir, "1x"), (probeDir, s"${copies}x"))) {
      if (r8eOnly) {
        time("pagerank_step", dir, tag)(graft.queries.ExtQueries.pagerankStep)
        time("char_diversity", dir, tag)(graft.queries.ExtQueries.charDiversity)
        time("kmv_intersect", dir, tag)(graft.queries.ExtQueries.kmvIntersect)
      } else if (r8dOnly) {
        time("lm_predict", dir, tag)(graft.queries.ExtQueries.lmPredictability)
        time("snapshot_diff", dir, tag)(graft.queries.ExtQueries.snapshotDiff)
      } else if (r8cOnly) {
        time("bm25_topk", dir, tag)(graft.queries.ExtQueries.bm25Topk)
        time("dsir_weights", dir, tag)(graft.queries.ExtQueries.dsirWeights)
        time("doc_winnow", dir, tag)(graft.queries.ExtQueries.docWinnow)
        time("winnow_neardup", dir, tag)(graft.queries.ExtQueries.winnowNeardup)
        time("ann_ivfpq", dir, tag)(graft.queries.ExtQueries.annIvfPq)
        time("gopher_rules", dir, tag)(graft.queries.ExtQueries.gopherRules)
      } else if (r8bOnly) {
        time("heavy_hitters", dir, tag)(graft.queries.ExtQueries.heavyHitters)
        time("dedup_incr", dir, tag)(graft.queries.ExtQueries.dedupIncremental)
      } else if (r8only) {
        // two-phase top-N: output fixed at cap·|domains| while input
        // grows N× — per-shard heaps keep every window task bounded
        time("domain_cap", dir, tag)(graft.queries.ExtQueries.domainCap)
        // one token-count shuffle + broadcast-back: linear in tokens
        time("doc_rarity", dir, tag)(graft.queries.ExtQueries.docRarity)
        // histogram window only: corpus pays a group-by + broadcast join
        time("quality_deciles", dir, tag)(graft.queries.ExtQueries.qualityDeciles)
        // per-metric stats broadcast: linear in samples, output ~2σ tail
        time("metric_outliers", dir, tag)(graft.queries.AnalyticsQueries.metricOutliers)
      } else {
      time("dedup_groups", dir, tag)(graft.queries.ExtQueries.dedupGroups)
      time("simhash_neardup", dir, tag)(graft.queries.ExtQueries.simhashNeardup)
      time("ngram_jaccard", dir, tag)(graft.queries.ExtQueries.ngramJaccard)
      time("contamination", dir, tag)(graft.queries.ExtQueries.contaminationCheck)
      // the subquery-range family: inner grid evaluated once, points
      // exploded to outer windows (PromEval.subqueryPoints) — cost is
      // inner points × (w/step), and amplified events mean N× more
      // series at unchanged per-series history, so the growth class
      // must be linear in series count
      time("pq_range_subq", dir, tag)(graft.queries.PromQueries.rangeSubquery)
      time("holt_subquery", dir, tag)(graft.queries.PromQueries.parsedHoltSubquery)
      time("predict_subq", dir, tag)(graft.queries.PromQueries.parsedPredictSubquery)
      // perceptual near-dup: amplified ids draw DIFFERENT fixture images
      // (the pattern is id-derived), so the rep count grows with the
      // corpus while the 16-bit hash space stays fixed — the probe
      // watches the collapse-then-band design keep pair generation
      // candidate-bounded as rep density rises
      time("multimodal_phash", dir, tag)(graft.queries.ExtQueries.multimodalPhash)
      if (!heavy) {
        time("doc_chunk", dir, tag)(graft.queries.ExtQueries.docChunk)
        time("dataset_shuffle", dir, tag)(graft.queries.ExtQueries.datasetShuffle)
        time("sessionize", dir, tag)(graft.queries.AnalyticsQueries.sessionize)
        time("asof_join", dir, tag)(graft.queries.AnalyticsQueries.asofJoin)
        time("vocab_oov", dir, tag)(graft.queries.ExtQueries.vocabOov)
        time("pii_scrub", dir, tag)(graft.queries.ExtQueries.piiScrub)
        time("emb_int8_recall", dir, tag)(graft.queries.ExtQueries.embInt8Recall)
        time("emb_kmeans_step", dir, tag)(graft.queries.ExtQueries.embKmeansStep)
        time("tfidf_topk", dir, tag)(graft.queries.ExtQueries.tfidfTopk)
      }
      }
    }
    if (!r8only && !r8bOnly) {
    time("ngram_jaccard", s"$probeDir/hot", s"hot${copies}x")(
      graft.queries.ExtQueries.ngramJaccard)
    time("dedup_groups", s"$probeDir/mega", s"mega${copies}x")(
      graft.queries.ExtQueries.dedupGroups)
    }
    spark.stop()
  }
}
