package graft

import org.apache.spark.sql.execution.FormattedMode

/** Dumps `explain("formatted")` for the headline queries to a markdown
  * file (default `PLANS.md`) — the plan-shape evidence for the scale
  * claims made in the scaladocs: pushed filters, broadcast joins,
  * single-shuffle window pipelines, top-k without global sorts. The
  * machine-checked subset of these properties lives in PlanShapeSpec;
  * this artifact is for humans reading the repo.
  *
  * Usage: runMain graft.ExplainAudit [sfDir] [outFile]
  */
object ExplainAudit {

  private[graft] val Headline = Seq(
    "flagship_gpu_daily", "revenue_by_nation", "pricing_summary",
    "latest_topk", "sessionize", "asof_join", "dedup_minhash_lsh",
    "simhash_neardup", "distinctive_terms", "ann_ivf_topk", "pq_rate",
    "prom_range_scan", "ngram_jaccard", "promql_parsed_topk",
    "promql_parsed_binop", "promql_parsed_histq", "promql_parsed_groupleft",
    "contamination_check", "stratified_sample",
    "promql_parsed_ratio", "promql_parsed_precedence",
    "promql_parsed_scalar", "promql_parsed_aggquantile",
    "pii_scrub", "url_domain_stats", "vocab_oov", "quality_weighted_sample",
    "packing_stats", "pq_range_rate", "pq_range_binop", "shipping_priority",
    // round 7: comparison matching, label copy, grid smoothing, subquery
    // rate, real-codec multimodal
    "promql_parsed_veccmp_on", "promql_parsed_groupleft_label",
    "pq_range_holtwinters", "promql_parsed_subquery_rate",
    "multimodal_features",
    // late round 7: curation + sampling aggregators + MAD + subquery closure
    "semdedup_prune", "dup_ngram_mass", "mix_plan",
    "promql_parsed_limitk", "promql_parsed_limitratio", "promql_parsed_mad",
    "pq_range_subquery", "promql_parsed_slo_quantile",
    "promql_parsed_holt_subquery",
    // round 8: edge-pinned @, classic-bucket fraction, bloom-prefiltered
    // decontamination, size-adaptive CC groups
    "promql_parsed_at_edges", "promql_parsed_histfraction",
    "contamination_bloom", "dedup_groups",
    // late round 8: retrieval chunking, seeded shuffle, perceptual image
    // near-dup, bucketed interval join, ordered funnel
    "doc_chunk", "dataset_shuffle", "multimodal_phash", "range_join",
    "funnel_steps", "emb_power_iter",
    // round 8 second batch: salted per-domain quota, exact-integer
    // z-score outliers, rarity scoring, histogram deciles
    "domain_cap", "metric_outliers", "doc_rarity", "quality_deciles",
    "pq_adc_topk",
    // round 8 third batch: mergeable-summary heavy hitters, incremental
    // batch-vs-corpus dedup
    "heavy_hitters", "dedup_incremental", "cms_counts", "zorder_layout",
    "zorder_prune", "table_profile",
    // round 8 fourth batch: C4-style line-level dedup, cohort retention,
    // vocabulary-weighted BPE merge step
    "line_dedup", "retention_cohorts", "bpe_merge_step",
    // round 8 final batch: corpus-as-LM quality score, snapshot diff,
    // split-leakage audit, PageRank step over the near-dup graph,
    // KMV sketch algebra, M4 dashboard downsampling
    "lm_predictability", "snapshot_diff", "split_leakage",
    "pagerank_step", "kmv_intersect", "m4_downsample",
    // round 9 tail: hybrid-retrieval fusion over two bounded top-k
    // lists, and the IVF-vs-brute recall audit
    "rrf_fusion", "emb_recall_at_k",
    // round 11: full Lloyd's k-means as one declarative DAG, and the
    // trained-index IVF probe it feeds
    "emb_kmeans_full", "ann_ivf_trained",
    // round 12: multi-probe over the trained index, and the recall@5
    // audit of both probe settings against exact brute force
    "ann_ivf_trained_mp", "emb_recall_trained",
    // round 12 tail: real-Y4M frame-sampled video decode, exact
    // box-filter resize, LSH recall/precision tuning curve
    "multimodal_video", "multimodal_resize", "minhash_recall",
    // round 13: the multi-merge BPE trainer as one native aggregate
    // over the session vocabulary, and the encoder applying its merge
    // table back to the corpus
    "bpe_train_steps", "bpe_encode_stats",
    // round 13 tail: greedy k-center diversity selection over the
    // deterministic bottom-k sample, and windowed audio VAD features
    // over the real PCM decode
    "diversity_kcenter", "multimodal_audio_vad",
    // round 14: the trained IVF+PQ serving shape (coarse quantizer +
    // PQ codes + ADC) at both probe settings, its recall audit beside
    // emb_recall_trained, the cross-modal caption↔media pairing audit,
    // and canonical-representative selection over the session-scoped
    // component frame
    "ann_ivfpq_trained", "ann_ivfpq_trained_mp", "emb_recall_ivfpq",
    "ann_ivfpq_residual", "emb_recall_residual",
    "caption_media_join", "dedup_keep_best",
    // round 14 tail: the filter-overlap Venn (quality × language ×
    // near-dup) — the stage-ordering diagnostic
    "filter_agreement",
    // round 17: the set-tier precedence pins (or below and/unless) and
    // the third/fourth multiplexed stream consumers (session-length
    // histogram off the session_window gate, churn panel off the CDC
    // merge snapshot)
    "promql_parsed_setop_precedence", "promql_parsed_setop_unless",
    "sessions_length_stream", "cdc_snapshot_churn_stream",
    // round 17 second batch: set-operator matching modifiers
    "promql_parsed_setop_on", "promql_parsed_setop_ignoring",
    "promql_parsed_setop_or_on",
    // round 17 third batch: the matryoshka serving-dimension audit,
    // and set-op matching under grid evaluation
    "emb_matryoshka_recall", "pq_range_setop_on")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = GraftSession.local(4)
    // The document captures the STATIC planner output. With AQE on, a
    // builder that executes fixtures at build time embeds EXECUTED
    // adaptive fragments whose broadcast build side depends on stage
    // completion ORDER (AQE re-optimizes on whichever stage's runtime
    // stats land first) — byte-identical trees then regenerate
    // different text and the gates.sh staleness check flaps. AQE
    // runtime behavior is asserted where it belongs, post-execution in
    // PlanShapeSpec; here the plans stay deterministic.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sb = new StringBuilder
    sb ++= s"""# PLANS — physical plans of the headline queries
              |
              |Generated by `runMain graft.ExplainAudit` against `$sfDir`.
              |Plans are pre-execution (AQE may further coalesce partitions and
              |convert eligible shuffle joins to broadcast at runtime). Things to
              |check per plan: `PushedFilters` on every parquet scan that has a
              |filter, `BroadcastHashJoin` wherever one side is a dimension,
              |`TakeOrderedAndProject` for top-k, and exchange count on the
              |window pipelines.
              |""".stripMargin
    Headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb ++= s"\n## $name\n\n```\n"
      // plan_id / AQE query-stage ids / codegen ids are JVM-global or
      // traversal-order counters — normalize them so the gates.sh
      // staleness check diffs plan STRUCTURE, not counter state
      // (QueryStage "Arguments: N" is the stage id; dedup_groups'
      // builder executes its CC iterations at build time, so those
      // counters shift with execution interleaving)
      sb ++= df.queryExecution.explainString(FormattedMode).trim
        .replaceAll("plan_id=\\d+", "plan_id=*")
        .replaceAll("codegen id : \\d+", "codegen id : *")
        .replaceAll(
          "(QueryStage\\n(?:Output[^\\n]*\\n)?)Arguments: \\d+",
          "$1Arguments: *")
        // the codec seams' deserializer lambdas print as JVM object
        // identities (class counter + hashCode) — run-specific too
        .replaceAll("\\$\\$Lambda\\$\\d+/0x[0-9a-f]+@[0-9a-f]+",
          "\\$\\$Lambda\\$*")
        // expression ids are a JVM-global counter as well; builders
        // that execute plans at build time (dedup_groups' CC rounds,
        // the zorder layout guard) shift every later query's ids.
        // Attribute NAMES carry the plan's meaning; the ids don't.
        .replaceAll("#\\d+", "#*")
      sb ++= "\n```\n"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote $out (${Headline.size} plans)")
    spark.stop()
  }
}
