"""User-defined function surface (SURVEY.md §2B): the two Python UDF
tiers and SQL registration.

Tiering (the 100 TB rule):
1. Built-in ``pyspark.sql.functions`` — JVM codegen, always first
   choice (see scalar.py: the whole scalar surface is built-ins).
2. ``@pandas_udf`` — Arrow-batched, vectorized numpy/pandas per batch.
   ~10-100× faster than row UDFs; the only acceptable Python hot path.
3. Row-at-a-time ``F.udf`` — one Python call per row, pickled both
   ways. Kept here to demonstrate the surface and as the escape hatch
   for non-vectorizable logic; never in a hot path.

``register_udfs(spark)`` exposes both to ``spark.sql`` so SQL users
get the same surface as the DataFrame API.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType


@F.pandas_udf(LongType())
def discount_micros(extendedprice: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized (Arrow) pandas UDF: exact integer discount value in
    micro-units. Both inputs carry 2 decimals, so price*100 and
    discount*100 are integers; their product is exact in float64 —
    deterministic across engines (no float-rounding hazard)."""
    return pd.Series(
        (np.rint(extendedprice.to_numpy() * 100) * np.rint(discount.to_numpy() * 100))
        .astype(np.int64)
    )


@F.udf(ArrayType(StringType()))
def tokenize_slow(text):
    """Row-at-a-time Python UDF (the documented SLOW path — one
    interpreter call per row). Splits on single spaces, preserving
    empties, to match DuckDB ``string_split(s, ' ')`` exactly."""
    if text is None:
        return None
    return text.split(" ")


def register_udfs(spark: SparkSession) -> None:
    """Make both UDF tiers callable from ``spark.sql``."""
    spark.udf.register("discount_micros", discount_micros)
    spark.udf.register("tokenize_slow", tokenize_slow)
