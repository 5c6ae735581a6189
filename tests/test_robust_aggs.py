"""Semantic tests for the skew-safe distinct and winsorized stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators.aggstats import (
    q_salted_exact_distinct,
    q_winsorized_stats,
)
from mi_inbound_pulsar_spark.sources.tables import load_table


def test_salted_distinct_equals_direct(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    direct = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    got = {r.event_type: r.n_users for r in q_salted_exact_distinct(spark, sf_dir).collect()}
    assert got == direct


def test_winsorized_stats_invariants(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    n_by_type = {r.event_type: r.n for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    rows = q_winsorized_stats(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(n_by_type)
    for r in rows:
        assert r.n_events == n_by_type[r.event_type]
        # p01/p99 clipping flags at most ~2% of rows (interpolated bounds)
        assert r.n_clipped <= 0.03 * r.n_events + 2
        assert r.min_micro <= r.avg_micro <= r.max_micro
        # clipped extremes pull the winsorized max inside the raw max
        raw_max = (
            e.filter(F.col("event_type") == r.event_type)
            .agg(F.max(F.round(F.col("value") * 1000000, 0).cast("long")))
            .collect()[0][0]
        )
        assert r.max_micro <= raw_max
