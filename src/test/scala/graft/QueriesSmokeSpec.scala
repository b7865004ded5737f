package graft

import graft.SparkEntry

/** Golden row counts per declared query at sf0.001.
  *
  * The values were cross-checked against DuckDB running the oracle SQL on
  * the same parquet (tools/check.py, 39/39 value-exact) — this suite pins
  * them so regressions surface in `sbt test` before the driver runs.
  * q07/q17/q29 are legitimately empty at this scale factor (every customer
  * has orders, every clicker purchased, no exact-dup docs).
  */
class QueriesSmokeSpec extends SparkSpec {

  val golden: Map[String, Long] = Map(
    "q01_scan_filter_project" -> 100L,
    "q02_pricing_summary" -> 6L,
    "q03_join_inner" -> 5L,
    "q04_join_broadcast" -> 25L,
    "q05_join_left_outer" -> 150L,
    "q06_join_semi" -> 150L,
    "q07_join_anti" -> 0L,
    "q08_join_theta" -> 39L,
    "q09_join_asof" -> 202L,
    "q10_agg_distinct" -> 5L,
    "q11_agg_rollup" -> 10L,
    "q12_window_rank" -> 449L,
    "q13_window_analytic" -> 1000L,
    "q14_topk" -> 10L,
    "q15_set_union" -> 15L,
    "q16_set_intersect" -> 15L,
    "q17_set_except" -> 0L,
    "q18_string_funcs" -> 26L,
    "q19_date_funcs" -> 500L,
    "q20_math_funcs" -> 1000L,
    "q21_array_funcs" -> 100L,
    "q22_json_funcs" -> 5L,
    "q23_window_tumbling" -> 868L,
    "q24_window_sliding" -> 1065L,
    "q25_window_session" -> 946L,
    "q26_dedup" -> 1000L,
    "q27_projection_latest" -> 15L,
    "q28_event_log_audit" -> 150L,
    "q29_doc_dedup_md5" -> 0L,
    "q30_text_tokens" -> 20L,
    "q31_similarity_topk" -> 10L,
    "q32_lang_stats" -> 5L,
    "q33_bnpl_pipeline" -> 18L,
    "q34_minhash_lsh" -> 28L,
    "q35_simhash" -> 25L,
    "q36_ngram_jaccard" -> 28L,
    "q38_ann_lsh" -> 10L,
    "q37_cosine_neardup" -> 20L,
    "q39_langid" -> 500L,
    "q40_quality_score" -> 500L,
    "q41_token_count" -> 500L,
    "q42_doc_fingerprint" -> 438L,
    "q43_media_pipeline" -> 500L,
    "q44_pivot" -> 15L,
    "q45_percentiles" -> 3L,
    "q46_correlated_subquery" -> 754L,
    "q47_salted_agg" -> 5L,
    "q48_unpivot" -> 75L,
    "q49_cube" -> 12L,
    "q51_dataset_split" -> 3L,
    "q52_stratified_sample" -> 100L,
    "q53_approx_ndv" -> 5L,
    "q54_doc_chunking" -> 1249L,
    "q55_ivf_centroids" -> 640L,
    "q56_ivf_probe" -> 10L,
    "q50_map_funcs" -> 500L,
    "q57_dedup_clusters" -> 45L,
    "q58_tfidf" -> 1500L,
    "q59_int8_quantize" -> 500L,
    "q60_rolling_window" -> 1000L,
    "q61_argminmax" -> 15L,
    "q62_funnel" -> 15L,
    "q63_event_journey" -> 15L,
    "q64_bigram_model" -> 91L,
    "q65_quantized_ann" -> 10L,
    "q66_dedup_materialize" -> 500L,
    "q67_decontamination" -> 12L,
    "q68_approx_percentiles" -> 3L,
    "q69_rank_distribution" -> 1000L,
    "q70_fuzzy_match" -> 16L,
    "q71_oov_redaction" -> 500L,
    "q72_token_sharding" -> 14L,
    "q73_lm_perplexity" -> 500L,
    "q74_pmi_collocations" -> 50L,
    "q75_windowed_distinct" -> 531L,
    "q76_boilerplate_chunks" -> 74L,
    "q77_knn_join" -> 2500L,
    "q78_repetition_score" -> 500L,
    "q79_quality_weighted_sample" -> 5L,
    "q80_mixture_weights" -> 20L,
    "q81_semantic_dedup" -> 93L,
    "q82_char_entropy" -> 500L,
    "q83_source_overlap" -> 190L,
    "q84_containment" -> 28L,
    "q85_random_projection" -> 8000L,
    "q86_cohort_retention" -> 30L,
    "q87_time_range_join" -> 202L,
    "q88_heavy_hitters" -> 20L,
    "q89_zipf_fit" -> 1L,
    "q136_boilerplate_scrub" -> 500L,
    "q137_disjunctive_revenue" -> 1L,
    "q138_product_profit" -> 70L,
    "q139_shipping_lag_pivot" -> 5L,
    "q140_forward_fill" -> 1000L,
    "q141_event_streaks" -> 15L,
    "q142_peak_concurrency" -> 2L,
  )

  test("every declared query has an oracle entry or is explicitly exempt") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // engine-specific sketch values (HLL NDV, quantile sketches) are the
    // only allowed gaps — each is error-bounded vs its exact twin in
    // LlmOpsSpec per the SURVEY §2.2 exemption
    assert(noOracle == Set("q53_approx_ndv", "q68_approx_percentiles"),
      s"unexpected oracle gaps: $noOracle")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() == 18L)
  }

  test("q139 partitions the joined lines: late + ontime = |lineitem|") {
    // Q12's CASE pivot puts every joined line in exactly one bucket, so
    // the bucket totals must reconstruct the fact-table cardinality (the
    // orderkey join is lossless — every line has its order)
    val rows = SparkEntry.queries("q139_shipping_lag_pivot")(spark, sf001).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val lines = graft.tables.Tables.lineitem(spark, sf001).count()
    assert(total == lines, s"buckets sum to $total, lineitem has $lines")
  }

  for ((name, expected) <- golden.toSeq.sortBy(_._1)) {
    test(s"$name row count at sf0.001") {
      val got = SparkEntry.queries(name)(spark, sf001).count()
      assert(got == expected, s"$name: got $got, expected $expected")
    }
  }
}
