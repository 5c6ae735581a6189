"""Operator registry.

Every operator module registers its queries with :func:`query`. A query
is a ``(spark, sf_dir) -> DataFrame`` callable plus (optionally) the
ANSI-SQL string a DuckDB oracle runs on the same parquet tables.
``collect_queries()`` / ``collect_oracles()`` aggregate all modules for
``__spark_entry__.py``.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = (
    "mi_inbound_pulsar_spark.operators.relational",
    "mi_inbound_pulsar_spark.operators.tpch",
    "mi_inbound_pulsar_spark.operators.aggstats",
    "mi_inbound_pulsar_spark.operators.windows",
    "mi_inbound_pulsar_spark.operators.setops",
    "mi_inbound_pulsar_spark.operators.scalar",
    "mi_inbound_pulsar_spark.operators.eventsops",
    "mi_inbound_pulsar_spark.operators.asof",
    "mi_inbound_pulsar_spark.operators.ingestion",
    "mi_inbound_pulsar_spark.operators.dedup",
    "mi_inbound_pulsar_spark.operators.similarity",
    "mi_inbound_pulsar_spark.operators.ann_kmeans",
    "mi_inbound_pulsar_spark.operators.ann_pq",
    "mi_inbound_pulsar_spark.operators.text",
    "mi_inbound_pulsar_spark.operators.multimodal",
    "mi_inbound_pulsar_spark.operators.sampling",
    "mi_inbound_pulsar_spark.operators.cdc",
    "mi_inbound_pulsar_spark.operators.graph",
    "mi_inbound_pulsar_spark.operators.funnel",
    "mi_inbound_pulsar_spark.operators.auditstats",
    "mi_inbound_pulsar_spark.operators.tsstats",
    "mi_inbound_pulsar_spark.operators.ranktests",
    "mi_inbound_pulsar_spark.operators.agreement",
    "mi_inbound_pulsar_spark.operators.divergences",
    "mi_inbound_pulsar_spark.operators.mregression",
    "mi_inbound_pulsar_spark.operators.posthoc",
    "mi_inbound_pulsar_spark.operators.clusterval",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


# Explicit presentation order. External correctness harnesses sample the
# FIRST N entries of ``queries()``, so the head of this list is a stratified
# sampler: one or two representatives of every operator family (relational,
# TPC-H, aggregates, windows, set ops, scalar functions, streaming-shaped,
# as-of, ingestion parity, dedup/LSH, similarity, text, multimodal, approx)
# rather than whole families back-to-back. Queries not listed here follow in
# registration order.
_PRIORITY = (
    # ROUND-13 ROTATION. The driver samples the FIRST 50 entries of
    # ``queries()``; cumulative driver-hard coverage closed at 503/503
    # in round 12, so tier 1 (never-checked) is empty. Same mechanical
    # policy as round 12:
    #   1. queries whose implementation (or a helper kernel) CHANGED
    #      this round — the association-rules basket rewrite, the LSH
    #      verifiers under the jaccard_pairs pin opt-out, the k-core
    #      round fusion, the three replay queries under the new epoch
    #      write protocol, and the five knn_self_join consumers (the
    #      id-domain guard lives inside their cogroup UDF);
    #   2. remaining slots re-verify OLDEST-GREEN first: the round-2
    #      window's names (their last driver check), in that window's
    #      order, minus names already in tier 1 or re-verified in the
    #      round-12 window.
    "q_association_rules",
    "q_minhash_lsh_neardup",
    "q_dedup_incremental_lsh",
    "q_kcore_peel",
    "q_streaming_composed_replay",
    "q_streaming_privacy_replay",
    "q_streaming_curation_replay",
    "q_mutual_knn",
    "q_knn_classification",
    "q_hard_negative_mining",
    "q_core_distance",
    "q_local_outlier_factor",
    "q09_product_profit",
    "q12_priority_by_flag",
    "q_agg_conditional",
    "q_window_analytic",
    "q_window_time_range",
    "q_topk_per_group",
    "q_intersect_all",
    "q_unpivot",
    "q_pivot",
    "q_array_higher_order",
    "q_json_extract",
    "q_funnel_stages",
    "q_scd2_dimension",
    "q_salted_exact_distinct",
    "q_window_tumbling",
    "q_session_window",
    "q_ewma_smoothing",
    "q_zscore_per_group",
    "q_asof_join",
    "q_msg_metadata_projection",
    "q_topic_pattern_subscribe",
    "q_read_compacted",
    "q_chunk_reassembly",
    "q_dlq_split",
    "q_retry_pipeline_audit",
    "q_dedup_exact",
    "q_embedding_neardup_lsh",
    "q_ann_ivf_topk",
    "q_ann_pq_recall",
    "q_token_count",
    "q_corpus_filter_pipeline",
    "q_bm25_search",
    "q_fuzzy_match",
    "q_multimodal_decode",
    "q_approx_distinct",
    "q_agg_approx_percentile",
    "q_hash_split",
    "q_doc_chunking",
    # -- ROUND-12 ROTATION (kept below slot 50 for stable ordering) --
    "q_tukey_hsd",
    "q_games_howell",
    "q_jonckheere_terpstra",
    "q_friedman_test",
    "q_page_trend_test",
    "q_quade_test",
    "q_calinski_harabasz",
    "q_davies_bouldin",
    "q_dunn_index",
    # -- policy tier 2: changed in round 11/12 --
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_regional_revenue",
    "q08_market_share",
    "q17_small_quantity_revenue",
    "q22_global_sales_opportunity",
    "q_sql_surface",
    "q_sax_symbolic",
    "q_containment_neardup",
    "q_periodogram",
    "q_levene_test",
    "q_sign_test",
    "q_wilcoxon_signed_rank",
    "q_krippendorff_alpha",
    "q_mincer_zarnowitz",
    # round-12 scale fixes: prefix-filter consolidation (shared exact
    # kernel + capped variant), the interval sweep-line rewrite, and
    # the banded inverted-index strategy kernel
    "q_prefix_filter_jaccard",
    "q_cluster_keeper",
    "q_dedup_report",
    "q_interval_overlap_join",
    "q_lsh_recall_audit",
    "q_jaccard_threshold_sweep",
    "q_ngram_jaccard_neardup",
    "q_triangle_count",
    "q_local_clustering",
    "q_degree_powerlaw_mle",
    # -- policy tier 3: oldest-green (round-1 window) re-verification --
    "q_filter_predicates",
    "q_join_left_outer",
    "q_join_semi_anti",
    "q_join_full_outer",
    "q_join_cross",
    "q_join_range_theta",
    "q_agg_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_having",
    "q_sort_limit",
    "q_subquery_scalar",
    "q_join_right_outer",
    "q_salted_skew_join",
    "q_lateral_topk",
    "q_recursive_calendar",
    "q04_order_priority",
    "q06_forecast_revenue",
    "q10_returned_items",
    "q12_priority_by_flag",
    "q14_promo_effect",
    "q18_large_volume",
    "q19_disjunctive_predicates",
    "q07_volume_shipping",
    "q13_customer_distribution",
    "q15_top_supplier",
    # -- prior rotations, kept for stable ordering past slot 50 --
    "q_bayesian_ab_exact",
    "q_beta_binomial_fit",
    "q_poisson_2sample_exact",
    "q_propensity_stratification",
    "q_risk_difference_nnt",
    "q_attributable_fraction",
    "q_runs_test",
    "q_turning_points",
    "q_von_neumann_ratio",
    "q_spectral_entropy",
    "q_pacf_durbin_levinson",
    "q_holt_winters_fixed_season",
    "q_jarque_bera",
    "q_diebold_mariano",
    "q_pettitt_test",
    "q_durbin_watson",
    "q_kupiec_pof",
    "q_gpd_peaks_over_threshold",
    "q_expected_shortfall",
    "q_median_polish",
    "q_mase_theil_u",
    "q_max_drawdown",
    "q_decomposition_strength",
    "q_cramer_von_mises",
    "q_anderson_darling_2sample",
    "q_brunner_munzel",
    "q_ansari_bradley",
    "q_mood_scale_test",
    "q_lepage_test",
    "q_baumgartner_weiss",
    "q_fleiss_kappa",
    "q_icc_oneway",
    "q_gwet_ac1",
    "q_weighted_kappa",
    "q_hellinger_tv_distance",
    "q_renyi_entropy",
    "q_energy_distance",
    "q_atkinson_theil",
    "q_ols_two_factor",
    "q_partial_correlation",
    "q_chow_test",
    "q_market_beta",
    "q_canonical_correlation",
    "q_mahalanobis_outliers",
    "q_hotelling_t2",
    "q_fisher_z_corr_diff",
    "q_granger_lag1",
    "q_breusch_pagan",
    "q_kruskal_wallis",
    "q_bartlett_test",
    "q_cochran_q",
    "q_fisher_exact",
    "q_landmark_harmonic",
    "q_err_eval",
    "q_theta_forecast",
    "q_hierarchical_reconciliation",
    "q_dp_quantile_exponential",
    "q_event_study",
    "q_fairness_audit",
    "q_rouge_overlap",
    "q_weibull_plot_fit",
    "q_good_turing",
    "q_price_elasticity",
    "q_hurst_exponent",
    "q_negbinomial_fit",
    "q_cronbach_alpha",
    "q_ipf_raking",
    "q_chi2_feature_selection",
    "q_classifier_threshold_sweep",
    "q_word2vec_subsample",
    "q_local_outlier_factor",
    "q_seasonal_mann_kendall",
    "q_feature_drift_report",
    "q_mantel_haenszel",
    "q_bradley_terry",
    "q_spiegelhalter_z",
    "q_benjamini_yekutieli",
    "q_embedding_anisotropy",
    "q_lexical_richness",
    "q_bpref_eval",
    "q_winnowing_fingerprint",
    "q_content_defined_chunking",
    "q_msttr_diversity",
    "q_burrows_delta",
    "q_ks_model_separation",
    "q_pr_auc_average_precision",
    "q_link_prediction_panel",
    "q_rich_club",
    "q_association_rules",
    "q_cumulative_incidence",
    "q_markov_entropy_rate",
    "q_count_sketch_audit",
    "q_e_value_sensitivity",
    "q_weighted_logrank",
    "q_tost_equivalence",
    "q_ams_f2_moment",
    "q_bloom_decontaminate",
    "q_chapman_estimator",
    "q_cochran_armitage",
    "q_cohen_kappa",
    "q_countmin_heavy_hitters",
    "q_fightin_words",
    "q_grubbs_outlier",
    "q_gumbel_maxima",
    "q_holt_linear",
    "q_hyperloglog_portable",
    "q_kendalls_w",
    "q_ljung_box",
    "q_logrank_test",
    "q_mcnemar_test",
    "q_mood_median",
    "q_overdispersion_check",
    "q_permutation_test",
    "q_precision_recall_at_k",
    "q_rmst_difference",
    "q_streaming_composed_replay",
    "q_table_profile",
    "q_term_burstiness",
    "q_theil_sen",
    "q_timeseries_similarity",
    "q_token_entropy",
    "q_tokenizer_fertility",
    "q_topic_throughput",
    "q_tumbling_ohlc",
    "q_twap",
    "q_ucb1_bandit",
    "q_udf_surface",
    "q_unigram_kl_drift",
    "q_union_distinct",
    "q_v_measure",
    "q_variant_extract",
    "q_vocab_overlap",
    "q_wasserstein_distance",
    "q_weighted_sample",
    "q_welch_ttest",
    "q_window_distribution",
    "q_window_ignore_nulls",
    "q_woe_iv",
    "q_zipf_slope",
    "q_moments_sketch",
    "q_kmv_distinct_sketch",
    "q_croston_intermittent",
    "q_kalman_local_level",
    "q_matrix_profile_topk",
)


def _ordered(mapping: dict[str, object]) -> dict[str, object]:
    out = {n: mapping[n] for n in _PRIORITY if n in mapping}
    out.update((n, v) for n, v in mapping.items() if n not in out)
    return out


def collect_queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)  # type: ignore[return-value]


def collect_oracles() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)  # type: ignore[return-value]
