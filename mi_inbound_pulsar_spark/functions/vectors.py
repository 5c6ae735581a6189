"""Vector math over ``ArrayType(FloatType)`` embedding columns.

All pure Spark higher-order functions (``zip_with`` + ``aggregate``) —
JVM-side, codegen'd, no Python in the row path. Sums accumulate in
DOUBLE left-to-right, which matches DuckDB's ``list_dot_product`` /
``list_cosine_similarity`` evaluation order, so results are
bit-comparable for oracle hashing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-order dot product of two float arrays (double out)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
