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
    # representatives of families already exercised + exact-arith regressions
    "q01_pricing_summary",
    "q09_product_profit",
    "q_agg_conditional",
    "q_filter_predicates",
    "q_join_range_theta",
    "q_salted_skew_join",
    "q_lateral_topk",
    "q_recursive_calendar",
    # window functions
    "q_window_analytic",
    "q_window_time_range",
    "q_topk_per_group",
    # set ops / reshaping
    "q_intersect_all",
    "q_unpivot",
    # scalar function surface
    "q_array_higher_order",
    "q_json_extract",
    # product analytics
    "q_funnel_stages",
    "q_last_touch_attribution",
    # CDC / warehouse maintenance
    "q_scd2_dimension",
    # robust / skew-safe aggregation
    "q_salted_exact_distinct",
    # streaming-shaped (batch-oracle forms)
    "q_window_tumbling",
    "q_session_window",
    "q_ewma_smoothing",
    "q_watermark_calibration",
    # as-of / interval joins
    "q_asof_join",
    "q_interval_overlap_join",
    # ingestion parity (reference consumer semantics)
    "q_msg_metadata_projection",
    "q_topic_pattern_subscribe",
    "q_read_compacted",
    "q_chunk_reassembly",
    "q_dlq_split",
    "q_retry_pipeline_audit",
    # dedup / LSH
    "q_dedup_exact",
    "q_ngram_jaccard_neardup",
    "q_minhash_lsh_neardup",
    "q_embedding_neardup_lsh",
    # similarity search
    "q_ann_ivf_topk",
    "q_nearest_centroid",
    # text analysis / retrieval
    "q_token_count",
    "q_corpus_filter_pipeline",
    "q_bm25_search",
    # graph over the near-dup relation (+ iterative integer PageRank)
    "q_triangle_count",
    "q_pagerank_purchases",
    # multimodal
    "q_multimodal_decode",
    # approximate aggregates (bounded-tolerance oracles)
    "q_approx_distinct",
    "q_agg_approx_percentile",
    # deterministic sampling / splitting + bounded-state contamination
    "q_hash_split",
    "q_bloom_contamination",
    # flagship end-to-end training-data prep (quality→dedup→split→pack)
    "q_training_data_pipeline",
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
