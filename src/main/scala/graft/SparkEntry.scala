package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is an operator from the SURVEY.md §2.2 inventory;
  * every key that is SQL-expressible also appears in `oracleSql` with the
  * DuckDB-equivalent text (authored side by side in
  * graft.queries.OracleSql).
  *
  * Cache lifetime convention: queries whose plan reads a shared
  * intermediate twice (q34/q35 signatures, q37's exploded LSH frame,
  * q71's token stream, q74's bigram counts) `cache()` that intermediate
  * and deliberately do NOT unpersist — the returned DataFrame is lazy, so
  * the cache is only populated when the CALLER runs an action, and only
  * the caller knows when the result is no longer live. Callers that run
  * many queries serially (Bench, Verify, Profile) call
  * [[SparkEntry.clearGraftCaches]] between queries; a long-lived
  * session embedding these operators must do the same or accept the
  * storage. (The RDD-unpersist half matters: the CC fixpoints (q57/q66/q81) and
  * q72's pinned frame use eager `localCheckpoint(true)` — correctness,
  * not just cost, depends on a single materialization — and checkpoint
  * blocks live OUTSIDE the catalog cache; relying on GC alone was the
  * round-4 bench inflation.) */
object SparkEntry {

  /** Session tuning every driver main and the test harness apply right
    * after building a session (`EngineConfs foreach spark.conf.set`;
    * library users embedding these operators should too).
    *
    * `runtime.bloomFilter.enabled=false` (r11 verdict item 2): Spark's
    * InjectRuntimeFilter has no NDV statistic on these plans, so every
    * injected bloom is built at the default expectedNumItems=10⁶ —
    * 8388608 bloom BITS = a 1 MiB literal serialized into the task
    * binary of every stage above it (the `Broadcasting large task
    * binary` WARNs in BENCH_r11's tail; TaskBinProbe attribution, bloom
    * bits found verbatim in the serialized stage graph: q95's panel
    * filter and q112's encode filter each triggered injection against a
    * ≤128-row build side). Measured at sf0.1 with injection off: q95
    * 4.7→3.9 s, q112 4.2→3.0 s, q116 0.93→0.65 s, q130 1.8→1.4 s —
    * uniformly faster, because the engine's joins already carry their
    * pruning explicitly (broadcast semi-joins, DPP on the bucketed
    * layout, the q90 salt) and the bloom build+ship is pure overhead.
    * At 1000-executor scale the same 1 MiB rides every task-set
    * broadcast — scheduler pressure, the exact failure mode the r11
    * verdict flagged. A deployment with cost-based stats that wants
    * right-sized blooms can re-enable per session. */
  val EngineConfs: Map[String, String] = Map(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")

  /** Apply [[EngineConfs]] to a live session (all confs are
    * runtime-settable). */
  def applyEngineConfs(spark: SparkSession): Unit =
    EngineConfs.foreach { case (k, v) => spark.conf.set(k, v) }

  /** Session tuning that is STATIC (read once at SparkSession creation) —
    * must go on the builder, not `spark.conf.set`; every driver main and
    * the test harness route their builders through
    * [[applyStaticEngineConfs]].
    *
    * `codegen.cache.maxEntries=4000` (r12 sized 2000; re-derived r14):
    * Spark's generated-class cache (Janino-compiled wholestage/expression
    * classes, including their JIT state) defaults to 100 entries
    * JVM-wide; an evicted class re-pays Janino compile + cold JIT on the
    * next pass — the measured gap between back-to-back Profile warmth
    * and in-bench minima (r12: suite 138.6→122.6 s going 100→2000).
    * The size must track the SUITE's working set: CodegenProbe (r14)
    * measured 2104 compiled classes per full pass at 147 queries, so the
    * r12 size of 2000 had tipped back into per-pass churn as the suite
    * grew — pass 2 recompiled 1644 classes at cache=2000 vs 68 at 4000,
    * warm-pass suite 152.0→127.5 s, q85 0.98→0.40 s (its 16 fused
    * DotProductFold kernels were exactly the eviction victims the r13
    * verdict flagged), q135 2.22→1.62 s, q99 5.18→3.87 s. Re-derived r15
    * at 184 queries: per-pass working set ~3560 classes (the unrolled
    * q183 greedy chain and the q181 tuned-IVF composition are codegen-
    * heavy), 89% of 4000 — pass 2 recompiled 251 at 4000 vs 130 at 6000
    * (the ~130 floor is per-run class-name churn, not eviction), suite
    * time flat. 6000 restores the r14 headroom ratio; cost is retained
    * class metadata (~10-100 KiB/entry) — bounded and worth it for any
    * long-lived session running many distinct plans; the same conf
    * applies executor-side on a cluster. Re-derive with CodegenProbe
    * whenever the suite grows by ~100 queries.
    *
    * The `SPARK_GRAFT_CODEGEN_CACHE` env override is the measurement seam
    * (r13 verdict item 2): the conf is builder-static, so an A/B across
    * sizes needs one process per size — CodegenProbe counts per-pass
    * Janino compilations (evictions) through this seam. */
  val StaticEngineConfs: Map[String, String] = Map(
    "spark.sql.codegen.cache.maxEntries" ->
      sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "6000"))

  /** Apply [[StaticEngineConfs]] to a session builder (call before
    * `getOrCreate`; on an already-running session these would be
    * silently ignored, which is exactly the static-conf hazard this
    * helper centralizes). */
  def applyStaticEngineConfs(b: SparkSession.Builder): SparkSession.Builder =
    StaticEngineConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Flagship query (SURVEY.md q33_bnpl_pipeline) on sf=0.001; the driver
    * smoke-checks rows > 0 (202 purchase events exist at sf0.001). */
  def entry(spark: SparkSession): DataFrame =
    Events.q33(spark, "/root/testdata/sf0.001")

  /** The cache-lifetime contract above, as a callable: drop every block a
    * finished query result may still pin — catalog-cached DataFrames
    * (the query-local `cache()`s) AND the localCheckpoint RDD blocks the
    * CC fixpoints / q72 hold outside the catalog (the round-4 lesson:
    * relying on GC for those inflated every later timing). Bench, Verify,
    * and Profile call this between queries; embed it the same way in any
    * long-lived session running these operators back to back. Blocking
    * unpersist: the storage is actually gone when this returns, so the
    * next query's timing or memory profile starts clean. */
  def clearGraftCaches(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    // Unpersisting a locally-checkpointed RDD logs one WARN per RDD
    // ("lineage has been truncated and cannot be recomputed") — correct
    // and intended here: the query is FINISHED, nothing recomputes it,
    // and a 124-query run otherwise emits hundreds of these, burying real
    // warnings (r9 verdict task 4). Suppression is display-only — the
    // blocking unpersist below still frees every block (the round-4
    // bench-inflation lesson stands) — and SCOPED (r11 advisor): the
    // rdd-package logger is lowered only AROUND the unpersist loop and
    // the previous level restored afterward, so genuine rdd-package
    // WARNs (block loss, replication failures) stay visible for the
    // rest of the session. Package level, not per-class: the WARN is
    // emitted under the CONCRETE RDD subclass logger (MapPartitionsRDD,
    // ShuffledRowRDD, …), an open set.
    silencingRddWarns {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
  }

  /** Run `body` with the rdd-package logger lowered to ERROR, restoring
    * the previous effective level after — the scoped form of the
    * lineage-truncation WARN suppression clearGraftCaches documents, for
    * any OTHER site that unpersists finished localCheckpoint RDDs
    * (IncrementalDedup's per-batch cleanup). Package level, not
    * per-class: the WARN is emitted under the concrete RDD subclass
    * logger (MapPartitionsRDD, …), an open set. */
  def silencingRddWarns[T](body: => T): T = {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.config.Configurator
    val pkg = "org.apache.spark.rdd"
    val saved = LogManager.getLogger(pkg).getLevel
    // Restore-to-INHERITED when the package had no explicit config (r12
    // advisor): Configurator.setLevel CREATES a LoggerConfig for pkg, and
    // restoring the captured EFFECTIVE level onto it would freeze the
    // package — later sparkContext.setLogLevel calls on the root would no
    // longer propagate here. Detect inheritance up front (the owning
    // LoggerConfig's name differs from pkg) and remove the config we
    // created instead of pinning a level.
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val hadExplicit = ctx.getConfiguration.getLoggerConfig(pkg).getName == pkg
    try {
      Configurator.setLevel(pkg, org.apache.logging.log4j.Level.ERROR)
      body
    } finally {
      if (hadExplicit) Configurator.setLevel(pkg, saved)
      else {
        ctx.getConfiguration.removeLogger(pkg)
        ctx.updateLoggers()
      }
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> Relational.q01 _,
    "q02_pricing_summary"     -> Aggregates.q02 _,
    "q03_join_inner"          -> Relational.q03 _,
    "q04_join_broadcast"      -> Relational.q04 _,
    "q05_join_left_outer"     -> Relational.q05 _,
    "q06_join_semi"           -> Relational.q06 _,
    "q07_join_anti"           -> Relational.q07 _,
    "q08_join_theta"          -> Relational.q08 _,
    "q09_join_asof"           -> Events.q09 _,
    "q10_agg_distinct"        -> Aggregates.q10 _,
    "q11_agg_rollup"          -> Aggregates.q11 _,
    "q12_window_rank"         -> Windows.q12 _,
    "q13_window_analytic"     -> Windows.q13 _,
    "q14_topk"                -> Relational.q14 _,
    "q15_set_union"           -> SetOps.q15 _,
    "q16_set_intersect"       -> SetOps.q16 _,
    "q17_set_except"          -> SetOps.q17 _,
    "q18_string_funcs"        -> Scalars.q18 _,
    "q19_date_funcs"          -> Scalars.q19 _,
    "q20_math_funcs"          -> Scalars.q20 _,
    "q21_array_funcs"         -> Scalars.q21 _,
    "q22_json_funcs"          -> Scalars.q22 _,
    "q23_window_tumbling"     -> Windows.q23 _,
    "q24_window_sliding"      -> Windows.q24 _,
    "q25_window_session"      -> Windows.q25 _,
    "q26_dedup"               -> Events.q26 _,
    "q27_projection_latest"   -> Windows.q27 _,
    "q28_event_log_audit"     -> Aggregates.q28 _,
    "q29_doc_dedup_md5"       -> Text.q29 _,
    "q30_text_tokens"         -> Text.q30 _,
    "q31_similarity_topk"     -> Vectors.q31 _,
    "q32_lang_stats"          -> Aggregates.q32 _,
    "q33_bnpl_pipeline"       -> Events.q33 _,
    "q34_minhash_lsh"         -> Dedup.q34 _,
    "q35_simhash"             -> Dedup.q35 _,
    "q36_ngram_jaccard"       -> Text.q36 _,
    "q38_ann_lsh"             -> Vectors.q38 _,
    "q37_cosine_neardup"      -> Vectors.q37 _,
    "q39_langid"              -> Text.q39 _,
    "q40_quality_score"       -> Text.q40 _,
    "q41_token_count"         -> Text.q41 _,
    "q42_doc_fingerprint"     -> Text.q42 _,
    "q43_media_pipeline"      -> MediaQ.q43 _,
    "q44_pivot"               -> Aggregates.q44 _,
    "q45_percentiles"         -> Aggregates.q45 _,
    "q46_correlated_subquery" -> Relational.q46 _,
    "q47_salted_agg"          -> Aggregates.q47 _,
    "q48_unpivot"             -> Aggregates.q48 _,
    "q49_cube"                -> Aggregates.q49 _,
    "q50_map_funcs"           -> Scalars.q50 _,
    "q51_dataset_split"       -> Sampling.q51 _,
    "q52_stratified_sample"   -> Sampling.q52 _,
    // q53 has no oracle entry (HLL sketch values are engine-specific;
    // SURVEY.md §2.2 exemption) — the driver records a rows-only check and
    // LlmOpsSpec asserts the error bound against the exact NDV.
    "q53_approx_ndv"          -> Aggregates.q53 _,
    "q54_doc_chunking"        -> Text.q54 _,
    "q55_ivf_centroids"       -> Vectors.q55 _,
    "q56_ivf_probe"           -> Vectors.q56 _,
    "q57_dedup_clusters"      -> Dedup.q57 _,
    "q58_tfidf"               -> Text.q58 _,
    "q59_int8_quantize"       -> Vectors.q59 _,
    "q60_rolling_window"      -> Windows.q60 _,
    "q61_argminmax"           -> Aggregates.q61 _,
    "q62_funnel"              -> Events.q62 _,
    "q63_event_journey"       -> Aggregates.q63 _,
    "q64_bigram_model"        -> Text.q64 _,
    "q65_quantized_ann"       -> Vectors.q65 _,
    "q66_dedup_materialize"   -> Dedup.q66 _,
    "q67_decontamination"     -> Text.q67 _,
    // q68 has no oracle entry (quantile-sketch values are engine-specific;
    // SURVEY.md §2.2 exemption, same as q53) — rows-only check from the
    // driver, error bound vs exact q45 asserted in LlmOpsSpec.
    "q68_approx_percentiles"  -> Aggregates.q68 _,
    "q69_rank_distribution"   -> Windows.q69 _,
    "q70_fuzzy_match"         -> Text.q70 _,
    "q71_oov_redaction"       -> Sampling.q71 _,
    "q72_token_sharding"      -> Sampling.q72 _,
    "q73_lm_perplexity"       -> Text.q73 _,
    "q74_pmi_collocations"    -> Text.q74 _,
    "q75_windowed_distinct"   -> Windows.q75 _,
    "q76_boilerplate_chunks"  -> Dedup.q76 _,
    "q77_knn_join"            -> Vectors.q77 _,
    "q78_repetition_score"    -> Text.q78 _,
    "q79_quality_weighted_sample" -> Sampling.q79 _,
    "q80_mixture_weights"     -> Sampling.q80 _,
    "q81_semantic_dedup"      -> Vectors.q81 _,
    "q82_char_entropy"        -> Text.q82 _,
    "q83_source_overlap"      -> Text.q83 _,
    "q84_containment"         -> Text.q84 _,
    "q85_random_projection"   -> Vectors.q85 _,
    "q86_cohort_retention"    -> Events.q86 _,
    "q87_time_range_join"     -> Events.q87 _,
    "q88_heavy_hitters"       -> Text.q88 _,
    "q89_zipf_fit"            -> Text.q89 _,
    "q90_ivf_knn"             -> Vectors.q90 _,
    "q91_inverted_index"      -> Text.q91 _,
    "q92_bm25"                -> Text.q92 _,
    "q93_textrank"            -> Text.q93 _,
    "q94_bpe_merges"          -> Tokenize.q94 _,
    "q95_retrieval_eval"      -> RetrievalEval.q95 _,
    "q96_sequence_packing"    -> Pack.q96 _,
    "q97_repeated_spans"      -> Dedup.q97 _,
    "q98_novelty_curve"       -> Text.q98 _,
    "q99_dedup_eval"          -> Dedup.q99 _,
    "q100_leakage_safe_split" -> Sampling.q100 _,
    // NOTE: q101 construction is NOT lazy — bloomOf runs a Spark job
    // (distributed Bloom build + single-row collect) while the plan is
    // being BUILT, so callers that only want the DataFrame (PlanSpec,
    // explain tooling) still pay the benchmark-side aggregation.
    "q101_bloom_decontamination" -> Text.q101 _,
    "q102_embedding_stats"    -> Vectors.q102 _,
    "q103_token_histogram"    -> Text.q103 _,
    "q104_mutual_knn_clusters" -> Vectors.q104 _,
    "q105_kn_bigram_lm"       -> Text.q105 _,
    "q106_source_top_terms"   -> Text.q106 _,
    "q107_embedding_outliers" -> Vectors.q107 _,
    "q108_quality_buckets"    -> Text.q108 _,
    "q109_dq_audit"           -> Quality.q109 _,
    "q110_grouping_sets"      -> Aggregates.q110 _,
    "q111_bpe_encode"         -> Tokenize.q111 _,
    "q112_pq_adc"             -> Vectors.q112 _,
    "q113_scd2_history"       -> Events.q113 _,
    "q114_bill_aging"         -> Events.q114 _,
    "q115_join_full_outer"    -> Relational.q115 _,
    "q116_shipping_priority"  -> Relational.q116 _,
    "q117_local_supplier_volume" -> Relational.q117 _,
    "q118_volume_shipping"    -> Relational.q118 _,
    "q119_returned_items"     -> Relational.q119 _,
    "q120_large_volume_customers" -> Relational.q120 _,
    "q121_supplier_diversity" -> Relational.q121 _,
    "q122_value_concentration" -> Relational.q122 _,
    "q123_top_supplier"       -> Relational.q123 _,
    "q124_dormant_capital"    -> Relational.q124 _,
    "q125_order_priority_check" -> Relational.q125 _,
    "q126_market_share"       -> Relational.q126 _,
    "q127_customer_distribution" -> Relational.q127 _,
    "q128_promo_revenue"      -> Relational.q128 _,
    "q129_small_qty_revenue"  -> Relational.q129 _,
    "q130_waiting_suppliers"  -> Relational.q130 _,
    "q131_dsir_weights"       -> Sampling.q131 _,
    "q132_ewma_smoothing"     -> Stats.q132 _,
    "q133_spike_detection"    -> Stats.q133 _,
    "q134_token_concentration" -> Text.q134 _,
    "q135_distribution_drift" -> Stats.q135 _,
    "q136_boilerplate_scrub"  -> Dedup.q136 _,
    "q137_disjunctive_revenue" -> Relational.q137 _,
    "q138_product_profit"     -> Relational.q138 _,
    "q139_shipping_lag_pivot" -> Relational.q139 _,
    "q140_forward_fill"       -> Windows.q140 _,
    "q141_event_streaks"      -> Windows.q141 _,
    "q142_peak_concurrency"   -> Events.q142 _,
    "q143_filtered_ann"       -> Vectors.q143 _,
    "q144_bulk_part_suppliers" -> Relational.q144 _,
    "q145_mixture_realization" -> Sampling.q145 _,
    "q146_ivf_tuned"          -> Vectors.q146 _,
    "q147_filtered_tuned_ann" -> Vectors.q147 _,
    "q148_hybrid_rrf"         -> RetrievalEval.q148 _,
    "q149_zorder_layout"      -> ZOrder.q149 _,
    "q150_compaction_plan"    -> ZOrder.q150 _,
    "q151_seasonal_baseline"  -> Stats.q151 _,
    "q152_snapshot_diff"      -> ChangeData.q152 _,
    "q153_transition_matrix"  -> Behavior.q153 _,
    "q154_attribution"        -> Behavior.q154 _,
    "q155_time_weighted_avg"  -> Behavior.q155 _,
    "q156_rfm_segments"       -> Behavior.q156 _,
    "q157_position_attribution" -> Behavior.q157 _,
    "q158_hard_negatives"     -> Vectors.q158 _,
    "q159_ohlc_bars"          -> Stats.q159 _,
    "q160_basket_pairs"       -> Basket.q160 _,
    "q161_calendar_fill"      -> Stats.q161 _,
    "q162_mad_outliers"       -> Stats.q162 _,
    "q163_skyline"            -> Skyline.q163 _,
    "q164_survival_hazard"    -> Behavior.q164 _,
    "q165_ab_chisq"           -> Stats.q165 _,
    "q166_cusum_changepoint"  -> Stats.q166 _,
    "q167_holt_trend"         -> Stats.q167 _,
    "q168_iqr_outliers"       -> Stats.q168 _,
    "q169_conversion_latency" -> Behavior.q169 _,
    "q170_ship_lag_quantiles" -> Relational.q170 _,
    "q171_type_correlation"   -> Stats.q171 _,
    "q172_traffic_drawdown"   -> Stats.q172 _,
    "q173_revenue_gini"       -> Stats.q173 _,
    "q174_revenue_deciles"    -> Stats.q174 _,
    "q175_truncation_recall"  -> Vectors.q175 _,
    "q176_frame_sampling"     -> MediaQ.q176 _,
    "q177_lag_correlation"    -> Stats.q177 _,
    "q178_session_flow"       -> Windows.q178 _,
    "q179_value_bands"        -> Stats.q179 _,
    "q180_equidepth_stats"    -> ZOrder.q180 _,
    "q181_hard_negatives_tuned" -> Vectors.q181 _,
    "q182_winsorized_stats"   -> Stats.q182 _,
    "q183_mmr_rerank"         -> Vectors.q183 _,
    "q184_bootstrap_ci"       -> Stats.q184 _,
    "q185_decayed_engagement" -> Stats.q185 _,
    "q186_mmr_tuned"          -> Vectors.q186 _,
    "q187_bootstrap_bucketed" -> Stats.q187 _,
    "q188_median_mad"         -> Stats.q188 _,
    "q189_theilsen_trend"     -> Stats.q189 _,
    "q190_kendall_tau"        -> Stats.q190 _,
    "q191_mann_kendall"       -> Stats.q191 _,
  )

  def oracleSql: Map[String, String] = OracleSql.all
}
