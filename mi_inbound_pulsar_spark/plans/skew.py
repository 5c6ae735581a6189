"""Skew mitigation for shuffle joins: explicit salting + AQE.

A shuffled join hashes rows to partitions by key; one hot key (a
celebrity user, a null-ish default, a burst topic) lands its entire
payload on ONE task — the straggler that dominates the stage. Two
remedies, both used by this engine:

- **AQE skew-join** (on by default in session.py): splits oversized
  partitions at runtime using map-output sizes. Zero code, but only
  kicks in past size thresholds and only for sort-merge joins.
- **Explicit salting** (this module): split each hot key into
  ``n_salts`` sub-keys deterministically, replicate the other side
  ``n_salts``×, join on (key, salt). Works for any join type, any
  size, and makes the fan-out explicit in the plan. Cost: the small
  side is materialized n_salts times — keep n_salts ≈ the skew factor,
  not 1000.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_src: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a replicated small side on (key, salt).

    ``salt_src`` names a column (or Column) on the skewed side whose
    hash spreads rows of the same hot key across salts — any
    high-cardinality column works (a row id, an event time). It must
    NOT be the join key itself (constant within a key → no spread).
    Deterministic: xxhash64, no rand(), so retries/replays agree.
    """
    src = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    if src is None:
        raise ValueError("salt_src is required: a column that varies within a key")
    salted = skewed.withColumn(SALT, F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int"))
    replicated = other.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [key, SALT], how).drop(SALT)
