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
    "mi_inbound_pulsar_spark.operators.text",
    "mi_inbound_pulsar_spark.operators.multimodal",
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


def collect_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def collect_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
