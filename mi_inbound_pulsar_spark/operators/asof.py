"""As-of (time-travel) join — an operator Spark's built-ins lack.

For each left row, attach the most recent right row of the same key
with ``right_ts <= left_ts``. The classic implementations are a range
join + row_number (O(matches) blowup before pruning) or a sorted merge.
This is the sorted-merge, Spark-first: both sides co-group by key
(``groupBy().cogroup().applyInPandas``) — ONE hash shuffle per side,
then each key group is merged in O(n log n) with
``pandas.merge_asof`` inside an Arrow batch. No JVM→Python row
traffic, no cross-key data movement, and skewed keys parallelize per
key group.

At 100 TB: the shuffle carries only the join columns selected here,
both sides partition by the same key so AQE can coalesce, and a hot
key's group must fit one Arrow batch — for pathological keys,
pre-split by time range (salt on ``date_trunc``) before cogrouping.

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
