"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``mi_inbound_pulsar_spark``; the query/oracle
pairs are registered side-by-side in the operator modules
(mi_inbound_pulsar_spark/operators/*) and aggregated here.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# The repo root is not necessarily on sys.path when the driver imports
# this file by path — make the package importable either way.
_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from mi_inbound_pulsar_spark.operators import collect_oracles, collect_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q5-shaped regional revenue: lineitem ⋈ orders ⋈ customer ⋈
    nation ⋈ region with broadcast dimensions (SURVEY.md §7 phase 0).
    """
    from mi_inbound_pulsar_spark.operators.relational import q05_regional_revenue

    return q05_regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return collect_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    return collect_oracles()
