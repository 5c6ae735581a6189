"""As-of (time-travel) join — an operator Spark's built-ins lack.

For each left row, attach the most recent right row of the same key
with ``right_ts <= left_ts``. Two Spark-first implementations:

- :func:`asof_join` (the default): tag and UNION both sides, one
  window per key ordered by time, ``last(right_cols, ignoreNulls)``
  carries the latest right row forward onto each left row. Entirely
  JVM-side (whole-stage codegen window), ONE hash shuffle total, and
  a right row is never replicated — the plan a 100 TB join wants.
- :func:`asof_join_pandas`: co-group by key and merge each group with
  ``pandas.merge_asof``. Same answer, but pays ~40 ms of Arrow
  round-trip per key group (measured: 6 s for 150 groups that the
  union-window form does in <2 s) — kept as the surface you extend
  when the per-group logic outgrows SQL (custom matching rules,
  model scoring), and as an independent implementation the
  equivalence test checks the window form against.

Skew note: both forms shuffle by key; a hot key serializes into one
window/group — pre-split hot keys by ``date_trunc`` salt if needed.

DuckDB has native ``ASOF JOIN``, which is the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join via union + window (pure JVM, the default).

    Ties (right_ts == left_ts) match, mirroring merge_asof backward
    inclusive: right rows sort before left rows at equal timestamps.

    The right columns ride in ONE struct and are carried with a single
    ``last(ignorenulls)`` — carrying each column independently would
    let a NULL field in the most recent right row be back-filled from
    an older right row, mixing values across rows (diverges from
    merge_asof/DuckDB ASOF on nullable right columns).
    """
    from pyspark.sql import Window
    from pyspark.sql.types import StructField, StructType

    left_names = [f.name for f in left.schema.fields]
    r_types = {f.name: f.dataType for f in right.schema.fields}
    l_types = {f.name: f.dataType for f in left.schema.fields}
    payload_t = StructType([StructField(c, r_types[c]) for c in right_cols])
    l_tagged = (
        left.withColumn("__t", F.col(left_ts))
        .withColumn("__is_left", F.lit(1))
        .withColumn("__r", F.lit(None).cast(payload_t))
    )
    r_tagged = (
        right.withColumn("__t", F.col(right_ts))
        .withColumn("__is_left", F.lit(0))
        .withColumn("__r", F.struct(*[F.col(c) for c in right_cols]))
    )
    for c in left_names:
        if c != key and c not in right.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(l_types[c]))
    cols = [key, "__t", "__is_left"] + [c for c in left_names if c != key] + ["__r"]
    u = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *[F.col(c) for c in [key, "__is_left"] + [c for c in left_names if c != key]],
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *left_names, *[F.col(f"__r.{c}").alias(c) for c in right_cols]
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per key.

    ``right_cols`` are the right-side columns to attach (must not
    collide with left's). Left rows with no prior right row keep nulls.
    """
    left_fields = left.schema.fields
    right_schema = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left_fields]
        + [f"{c} {right_schema[c]}" for c in right_cols]
    )
    left_names = [f.name for f in left_fields]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(left_ts, kind="mergesort")
        r = r.sort_values(right_ts, kind="mergesort")[[right_ts] + [
            c for c in right_cols if c != right_ts
        ]]
        out = pd.merge_asof(
            l, r, left_on=left_ts, right_on=right_ts, direction="backward"
        )
        out = out[left_names + right_cols]
        # unmatched rows: keep integer columns nullable for Arrow
        for c in right_cols:
            if right_schema[c] in ("bigint", "int") and out[c].dtype.kind == "f":
                out[c] = out[c].astype("Int64")
        return out

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, schema=out_schema)
    )


@query(
    "q_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id AS p_user, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT click_id, user_id, click_ts, purchase_id, purchase_ts
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.p_user AND c.click_ts >= p.purchase_ts
    ORDER BY click_id
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: each click gets the user's most recent
    prior purchase (or nulls). Oracle is DuckDB's native ASOF JOIN."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="click_ts",
        right_ts="purchase_ts",
        right_cols=["purchase_id", "purchase_ts"],
    ).orderBy("click_id")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Forward as-of: EARLIEST right row with right_ts >= left_ts per
    key (merge_asof direction='forward'). Same union+window plan as
    :func:`asof_join`, with the frame reversed: first_value over the
    following rows. Ties match (right at the same instant wins)."""
    from pyspark.sql import Window

    from pyspark.sql.types import StructField, StructType

    left_names = [f.name for f in left.schema.fields]
    r_types = {f.name: f.dataType for f in right.schema.fields}
    l_types = {f.name: f.dataType for f in left.schema.fields}
    payload_t = StructType([StructField(c, r_types[c]) for c in right_cols])
    l_tagged = (
        left.withColumn("__t", F.col(left_ts))
        .withColumn("__is_left", F.lit(1))
        .withColumn("__r", F.lit(None).cast(payload_t))
    )
    r_tagged = (
        right.withColumn("__t", F.col(right_ts))
        .withColumn("__is_left", F.lit(0))
        .withColumn("__r", F.struct(*[F.col(c) for c in right_cols]))
    )
    for c in left_names:
        if c != key and c not in right.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(l_types[c]))
    cols = [key, "__t", "__is_left"] + [c for c in left_names if c != key] + ["__r"]
    u = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))
    # rights sort AFTER lefts at equal __t (desc on __is_left reversed):
    # order by (__t, -__is_left) then look FORWARD — a right at the
    # same timestamp is in the following frame, so ties match. The
    # right payload rides in one struct (same-row guarantee, see
    # asof_join).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.col("__is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = u.select(
        *[F.col(c) for c in [key, "__is_left"] + [c for c in left_names if c != key]],
        F.first("__r", ignorenulls=True).over(w).alias("__r"),
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *left_names, *[F.col(f"__r.{c}").alias(c) for c in right_cols]
    )


@query(
    "q_asof_join_forward",
    oracle="""
    WITH clicks AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id AS next_purchase_id, user_id AS p_user, ts AS next_purchase_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT click_id, user_id, click_ts, next_purchase_id, next_purchase_ts
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.p_user AND c.click_ts <= p.next_purchase_ts
    ORDER BY click_id
    """,
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-lag as-of: each click gets the user's NEXT purchase
    at-or-after it (forward direction) — the click→conversion
    attribution query. Oracle: DuckDB ASOF with the inequality
    reversed."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("next_purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("next_purchase_ts"),
    )
    return asof_join_forward(
        clicks,
        purchases,
        key="user_id",
        left_ts="click_ts",
        right_ts="next_purchase_ts",
        right_cols=["next_purchase_id", "next_purchase_ts"],
    ).orderBy("click_id")
