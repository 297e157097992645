package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The real inventory lives in [[graft.Queries]] (one entry per SURVEY §2
  * operator, each with DuckDB oracle SQL where SQL-expressible).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the reference's core shape (enrich_features.py:151-179):
    * a fact table left-joined against broadcast dimensions plus derived
    * column expressions — here orders × customer with defaults.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.byName("pipe_enrich").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Queries in [[floorBound]] run inside [[graft.engine.Engine.floorScoped]]:
    * full-inventory TimeQ sweeps (AQE on vs off, 32 and 16 shuffle
    * partitions) showed their local wall time is AQE stage-materialization
    * job floor, not compute — each wins >0.35 s with AQE off, consistently
    * across partition settings, ~40 s across the set at sf0.1. The scope is
    * size- and conf-gated in the engine, so production-scale reads (and
    * plan-shape specs probing the raw fn via [[Queries.byName]]) still get
    * the native AQE plan with its skew/coalesce safety nets.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { q =>
      q.name -> (if (floorBound(q.name))
        (s: SparkSession, d: String) =>
          graft.engine.Engine.floorScoped(s, d)(q.fn(s, d))
      else q.fn)
    }.toMap

  private val floorBound: Set[String] = Set(
    "a1_union_tolerant", "a27_weighted_median", "curate_dedup_cascade",
    "curate_dsir", "curate_kcenter", "curate_mix_temperature",
    "curate_pipeline_e2e", "dedup_components", "dedup_containment",
    "dedup_embedding_cosine", "dedup_hamming_band", "dedup_incremental",
    "dedup_jaccard_bigram", "dedup_lsh_planner", "dedup_minhash_lsh",
    "dedup_prefix_filter", "dedup_semdedup", "dedup_simhash",
    "dedup_substring", "dedup_threshold_sweep", "dedup_url_canonical",
    "dq_dp_counts", "dq_embedding_audit", "dq_fd_discovery",
    "dq_k_anonymity", "dq_l_diversity", "dq_order_reconciliation",
    "dq_outlier_iqr", "dq_pk_uniqueness", "dq_profile_unpivot",
    "dq_ref_integrity", "dq_rules_report", "dq_t_closeness",
    "er_blocking_eval", "er_name_cluster", "er_survivorship",
    "f16_first_match_nested", "f7_fractional_odds", "f9_numeric_coerce",
    "g8_label_prop", "geo_dbscan_core", "j12_asof_join", "j21_asof_nearest",
    "j22_pit_scd2", "ml_auc_rank", "mm_ahash_neardup", "p10_scd2_history",
    "p7_upper_headers", "pipe_enrich", "stat_theil_sen",
    // round-7 second sweep: these win under the scope's 8-partition
    // fixture shuffles (32-partition stages were ~2/3 task floor on
    // them in a session-wide partitions A/B at sf0.1); queries with
    // their own inner AQE/partition scopes compose — the inner scope
    // restores to the outer scope's setting
    "curate_boilerplate_effect", "ml_naive_bayes_lang", "sim_ivf_probe_sweep",
    "sim_sparse_cosine", "stat_gini_lorenz", "stat_levene", "stat_spearman",
    "text_tfidf_top", "w30_winsorized",
    // round-7 third sweep: job storms on tiny task counts (9-16 driver
    // jobs over <100 tasks — AQE stage-per-job + broadcast rebuilds, not
    // compute) plus two 32-partition task-floor cases
    "curate_boilerplate", "seq_markov_perplexity", "seq_next_event",
    "sim_centroid_classify", "stat_bootstrap_poisson", "text_bigram_lm",
    "text_keyphrase_rake", "text_ppl_filter_sweep", "w16_attribution",
    // round-7 fourth sweep: the 0.8-1.3s bench tail — 7-29 driver jobs
    // over two-digit task counts each
    "a24_quantile_sketch", "curate_domain_mix", "eval_minhash_err",
    "g15_personalized_pagerank", "g5_adamic_adar", "ml_ks_separation",
    "ml_lift_gains", "rec_als_rank1", "seq_absorbing_funnel",
    "seq_entropy_rate", "seq_step_flow", "sim_ann_recall",
    "sim_hamming_topk", "sim_pq_adc", "stat_cramers_v",
    "text_code_switch", "text_js_source_drift", "text_mmr_diversify",
    "w4_ntile_percent_rank")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
