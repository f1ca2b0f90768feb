package graft

/** Catalog-wide physical-plan audit over the relational (non-streaming,
  * non-iterative) queries: the plans the engine ships must be the plans
  * you'd WANT at 100 TB — every join keyed (no cartesian/nested-loop
  * fallback) and the hot path inside whole-stage codegen. Queries whose
  * builders execute eagerly (streaming runs, connected-components
  * loops, localCheckpoint stages) or that intentionally broadcast a
  * cross product (exact cosine top-k) are excluded by name.
  */
class PlanAuditSpec extends SparkSpec {

  private val audited = Seq(
    "q01_pricing_summary", "q02_filter_project", "q03_semijoin_2way",
    "q04_semijoin_3way", "q05_semijoin_4way", "q06_bool_canon",
    "q08_partition_derive", "q09_union_anti_dedup", "q10_window_topk",
    "q11_sort_limit", "q12_distinct_agg", "q13_datetime_funcs",
    "q14_json_extract", "q15_watermark_boundary", "q16_rollup",
    "q17_sessionize", "q18_bronze_cast", "q20_dedup_exact",
    "q21_dedup_normkey", "q26_cosine_neardup", "q28_lang_id",
    "q29_quality_score",
    "q30_token_stats", "q31_fingerprint", "q33_agg_battery", "q34_cube",
    "q45_percentiles", "q46_salted_agg", "q49_string_funcs",
    "q50_conditionals", "q52_vocab_stats", "q54_join_agg",
    "q55_outer_join", "q57_setops", "q58_pivot", "q61_unpivot",
    "q64_grouping_sets", "q67_stratified_sample", "q68_tfidf",
    "q73_repetition", "q75_ntile", "q76_exists_subquery",
    "q77_running_sum", "q78_ngram_dedup", "q80_gap_fill",
    "q81_reservoir_sample", "q82_pii_scrub", "q86_moments",
    "q87_full_outer", "q90_range_frame", "q91_window_battery",
    "q92_json_struct", "q93_null_semantics", "q94_levenshtein",
    "q95_bit_aggs",
    "q101_inverted_index",
    // round-8 additions: map-only gates/kernels + the bucketed
    // sampler and curation composition
    "q174_c4_clean", "q175_blocklist_hits", "q176_paragraph_dedup",
    "q177_winnow_fingerprints", "q179_script_profile",
    "q180_mixture_denoise", "q181_token_budget_sample",
    "q183_web_curate", "q184_dedup_lines_within",
    // round-9 additions: the non-iterative graph/profile/batching
    // queries and the DSv2 scan (CC/PageRank/k-core/walk loops and
    // the checkpointing suffix family stay excluded as eager builders)
    "q192_triangle_lcc", "q193_quantile_profile", "q194_bucket_batches",
    "q196_docstore_scan", "q198_funnel", "q199_cohort_retention",
    // round-9 continuation: chunking/sketch/sampling dashboards
    // (q203 label propagation stays excluded as an eager
    // checkpointing loop)
    "q204_cdc_chunks", "q205_host_split", "q206_hll_portable",
    "q207_lsh_recall", "q208_decay_engagement", "q209_neyman_sample",
    // round-9 fifth wave (q219 excluded: eager CC loop; q210 streams)
    "q213_prefix_join", "q214_attribution", "q215_source_drift",
    "q216_covisitation", "q217_transitions", "q218_fk_audit",
    "q220_assoc_rules", "q221_lexical_diversity",
    "q222_lang_agreement")

  test("relational plans: keyed joins only, whole-stage codegen present") {
    val dir = sf("sf0.001")
    val qs = graft.queries.Catalog.all.filter(q => audited.contains(q.name))
    // names drift — fail loudly if the list goes stale instead of
    // silently auditing nothing
    assert(qs.size >= 50, s"audit list matched only ${qs.size} queries")
    // inspect the static physical plan: an un-executed
    // AdaptiveSparkPlan hides the codegen spans until stages run
    graft.streaming.EventsStream.withConf(spark,
      Seq("spark.sql.adaptive.enabled" -> "false")) {
    qs.foreach { q =>
      val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name}: cartesian product in plan")
      // these queries cross-join a broadcast SINGLE-ROW aggregate
      // (corpus size / step-1 user count / leak counter / count
      // scalars / reference day) into the output — a constant-cost
      // broadcast, not a data-sized nested loop; every data-sized
      // join must still be keyed
      // q215's grid additionally crosses the source list with the
      // BOUNDED bucket-cardinality global profile (dashboard state,
      // like q193's bucket table) — same constant-cost class
      val singleRowBroadcast = Set("q68_tfidf", "q198_funnel",
        "q205_host_split", "q207_lsh_recall", "q208_decay_engagement",
        "q214_attribution", "q215_source_drift", "q218_fk_audit",
        "q220_assoc_rules")
      if (!singleRowBroadcast.contains(q.name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name}: nested-loop join in plan")
      // codegen spans render as "*(n) Operator" in the tree string
      assert(plan.contains("*("),
        s"${q.name}: no whole-stage codegen span\n$plan")
    }
    }
  }
}
