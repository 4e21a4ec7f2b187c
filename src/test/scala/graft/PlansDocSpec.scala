package graft

import org.scalatest.funsuite.AnyFunSuite

/** Staleness tripwire for PLANS.md, the committed plan-shape evidence
  * (`runMain graft.ExplainAudit` regenerates it; PlanShapeSpec machine-
  * checks the load-bearing subset of its claims). Two invariants:
  *
  *  1. the committed PLANS.md's section list equals
  *     `ExplainAudit.Headline` exactly — an entry added to Headline
  *     without regenerating the doc, or a section surviving a removed
  *     entry, fails here (names only; plan TEXT legitimately drifts
  *     with stats/AQE and is regenerated wholesale each time);
  *  2. every registered query is either in Headline (⇒ has a committed
  *     plan section) or in the frozen pre-round-12 roster below — so a
  *     NEW query cannot ship without adding itself to Headline and
  *     regenerating PLANS.md. The roster is append-never: names leave
  *     it when their query gains a plan section or is unregistered.
  */
class PlansDocSpec extends AnyFunSuite {

  /** Registered queries that predate this tripwire and have no PLANS.md
    * section (frozen at round 12 — 127 names). Mostly thin PromQL
    * parser variants and stream gates whose plan evidence lives in
    * their family's headline representative. One amendment class since
    * the freeze: STREAM GATES added later also belong here rather than
    * in Headline — a stream gate's builder RUNS its stream and returns
    * a post-hoc parquet read, so "its plan" is a scan; the physical
    * evidence lives in the batch twin's section (dedup_keep_best for
    * dedup_keep_best_stream) and the state shape in the gate's spec.
    */
  private val preTripwire: Set[String] = Set(
    "dedup_keep_best_stream", // round 15's survivorship gate (see above)
    // round 16's multiplexed stream consumers: each builder touches its
    // donor gate's session artifact (running the stream on first
    // touch), so "its plan" is an aggregate over a parquet read; the
    // state evidence lives in the gate + its spec
    "conversion_rate_stream",
    "dedup_savings_stream",
    "ann_brute_topk", "ann_ivf_multiprobe", "ann_ivfpq_topk",
    "ann_lsh_topk", "approx_distinct_users", "bm25_topk",
    "cdc_merge_stream", "char_diversity", "cms_counts_stream",
    "conv_outer_stream", "conversion_pairs_stream", "curation_pipeline",
    "dataset_split", "dedup_exact", "dedup_exact_stream", "dedup_simhash",
    "dedup_wm_stream", "doc_fingerprint", "doc_repetition",
    "doc_rolling_hash", "doc_winnow", "dsir_weights", "emb_centroid_stats",
    "emb_int8_recall", "emb_kmeans_step", "emb_neardup",
    "exec_history_topk", "flagship_multiday", "gopher_rules",
    "gpu_daily_report", "hourly_avg", "hourly_avg_stream",
    "ingest_records", "kmv_distinct_users", "label_filter",
    "lang_confusion", "lang_id", "lang_source_pivot", "malformed_skip",
    "matrix_flatten", "metric_median", "metric_names", "metric_quantiles",
    "multi_key_group", "multimodal_meta", "multimodal_wav",
    "ngram_containment", "packing_plan", "per_query_stats", "pq_agg_by",
    "pq_agg_without", "pq_avg_by", "pq_bool_scalar", "pq_instant_vector",
    "pq_over_time", "pq_range_mad", "pq_range_matrix", "pq_range_overtime",
    "pq_range_scalarcmp", "promql_parsed_absent_ot", "promql_parsed_and",
    "promql_parsed_at", "promql_parsed_bottomk", "promql_parsed_calfns",
    "promql_parsed_changes", "promql_parsed_countvalues",
    "promql_parsed_delta", "promql_parsed_deriv",
    "promql_parsed_filtercmp", "promql_parsed_flagship",
    "promql_parsed_group", "promql_parsed_holtwinters",
    "promql_parsed_increase", "promql_parsed_irate",
    "promql_parsed_labeljoin", "promql_parsed_labelreplace",
    "promql_parsed_last", "promql_parsed_matcher", "promql_parsed_mathfn",
    "promql_parsed_mod", "promql_parsed_offset", "promql_parsed_or",
    "promql_parsed_overtime", "promql_parsed_predict",
    "promql_parsed_predict_subquery", "promql_parsed_present_ot",
    "promql_parsed_quantile", "promql_parsed_rate", "promql_parsed_regex",
    "promql_parsed_resets", "promql_parsed_roundfn",
    "promql_parsed_scalarcmp", "promql_parsed_scalarcmp_bool",
    "promql_parsed_sort", "promql_parsed_stddev",
    "promql_parsed_stdvar_ot", "promql_parsed_subquery_mods",
    "promql_parsed_subquery_step", "promql_parsed_timefns",
    "promql_parsed_timestamp", "promql_parsed_topk_by",
    "promql_parsed_unless", "promql_parsed_veccmp", "quantile_sketch",
    "quantile_sketch_grouped", "quantile_sketch_stream",
    "range_join_stream", "repair_candidates", "retention_cutoff",
    "rollup_report", "run_history", "session_window_stream",
    "sessionize_stream", "substr_dedup", "success_rate", "table_stats",
    "text_quality", "tfidf_topk", "token_bpe_stats", "token_stats",
    "top_customers", "unimax_alloc", "value_histogram", "window_last_week",
    "window_offsets", "window_yesterday", "winnow_neardup")

  private lazy val sections: Seq[String] = {
    val f = java.nio.file.Paths.get("PLANS.md")
    assert(java.nio.file.Files.isRegularFile(f), "PLANS.md missing from repo root")
    val text = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
    """(?m)^## (\S+)$""".r.findAllMatchIn(text).map(_.group(1)).toSeq
  }

  test("PLANS.md sections equal ExplainAudit.Headline (regenerate on change)") {
    val headline = ExplainAudit.Headline
    assert(sections.toSet == headline.toSet,
      s"PLANS.md is stale — run `sbt \"runMain graft.ExplainAudit\"` and commit. " +
        s"missing sections: ${headline.toSet -- sections.toSet}; " +
        s"orphaned sections: ${sections.toSet -- headline.toSet}")
    assert(sections.size == sections.distinct.size,
      s"duplicate PLANS.md sections: ${sections.diff(sections.distinct)}")
  }

  test("every registered query has a plan section or predates the tripwire") {
    val registered = SparkEntry.queries.keySet
    val uncovered = registered -- ExplainAudit.Headline.toSet -- preTripwire
    assert(uncovered.isEmpty,
      s"new queries without a PLANS.md section — add them to " +
        s"ExplainAudit.Headline and regenerate: $uncovered")
    // roster hygiene: entries must not shadow a headline section and
    // must still be registered (append-never, shrink-on-coverage)
    val shadowed = preTripwire.intersect(ExplainAudit.Headline.toSet)
    assert(shadowed.isEmpty,
      s"preTripwire names now covered by Headline — remove them: $shadowed")
    val gone = preTripwire -- registered
    assert(gone.isEmpty,
      s"preTripwire names no longer registered — remove them: $gone")
  }
}
