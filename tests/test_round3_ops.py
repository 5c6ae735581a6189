"""Invariant tests for the round-3 operator additions — properties that
must hold on ANY testdata regeneration, complementing the exact DuckDB
oracles (which pin current values)."""

from __future__ import annotations

import pytest


def test_bloom_contamination_is_superset_of_exact(spark, sf_dir):
    """A Bloom filter has no false negatives: every test doc the exact
    shingle-join audit flags must also be flagged by the bloom screen."""
    from pyspark.sql import functions as F

    from mi_inbound_pulsar_spark.operators.dedup import shingles
    from mi_inbound_pulsar_spark.operators.sampling import (
        hash_bucket,
        q_bloom_contamination,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), "split-")
    tagged = d.withColumn("_b", b)
    train_sh = shingles(tagged.filter(F.col("_b") < "cd")).select("shingle").distinct()
    test_sh = shingles(tagged.filter(F.col("_b") >= "e6"))
    exact_flagged = {
        r["doc_id"]
        for r in test_sh.join(train_sh, "shingle").select("doc_id").distinct().collect()
    }
    bloom_flagged = {
        r["doc_id"]
        for r in q_bloom_contamination(spark, sf_dir).filter("flagged").collect()
    }
    assert exact_flagged <= bloom_flagged


def test_pagerank_hub_nodes_rank_highest(spark, sf_dir):
    """Ranks are ≥ the 0.15 floor, and the top-25 contains at least one
    node from each side of the bipartite graph (customers < 1M offset,
    suppliers ≥ 1M) — a rank sink on one side would signal a broken
    orientation or dangling-mass bug."""
    from mi_inbound_pulsar_spark.operators.graph import q_pagerank_purchases

    rows = q_pagerank_purchases(spark, sf_dir).collect()
    assert len(rows) == 25
    assert all(r["rank_ppm"] >= 150000 for r in rows)
    sides = {r["node"] >= 1000000 for r in rows}
    assert sides == {True, False}


def test_session_paths_bounded_and_exhaustive(spark, sf_dir):
    """Paths are at most 5 events long and every reported path is built
    from real event types."""
    from mi_inbound_pulsar_spark.operators.eventsops import (
        EVENT_TYPES,
        q_session_paths,
    )

    rows = q_session_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        steps = r["path"].split(">")
        assert 1 <= len(steps) <= 5
        assert set(steps) <= set(EVENT_TYPES)
        assert r["n_sessions"] > 0


def test_attribution_partitions_all_purchases(spark, sf_dir):
    """Attributed purchase counts must sum to the total purchase count —
    attribution is a partition of purchases, never a filter."""
    from pyspark.sql import functions as F

    from mi_inbound_pulsar_spark.operators.eventsops import q_last_touch_attribution
    from mi_inbound_pulsar_spark.sources.tables import load_table

    total = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    attributed = sum(
        r["n_purchases"] for r in q_last_touch_attribution(spark, sf_dir).collect()
    )
    assert attributed == total


def test_nearest_centroid_confusion_covers_corpus(spark, sf_dir):
    """Every embedding is assigned exactly once: confusion-matrix counts
    sum to the corpus size, and the diagonal dominates (centroids built
    from the labels themselves must classify better than chance)."""
    from mi_inbound_pulsar_spark.operators.similarity import q_nearest_centroid
    from mi_inbound_pulsar_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    rows = q_nearest_centroid(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == n
    diag = sum(r["n"] for r in rows if r["true_label"] == r["assigned_label"])
    # 10 labels ⇒ chance is 0.10; the synthetic labels overlap heavily,
    # so gate at 2× chance (observed 0.37 at sf0.001, 0.4+ at sf0.01)
    assert diag / n > 0.2


def test_watermark_calibration_percentiles_ordered(spark, sf_dir):
    from mi_inbound_pulsar_spark.operators.eventsops import q_watermark_calibration

    r = q_watermark_calibration(spark, sf_dir).collect()[0]
    assert 0.0 <= r["late_fraction"] <= 1.0
    assert r["p95_disorder_us"] <= r["p99_disorder_us"] <= r["max_disorder_us"]
    assert r["n_out_of_order"] <= r["n_arrivals"]
    # non-degeneracy (round-10): the jittered arrival clock must
    # actually produce out-of-order arrivals — the pre-fix proxy made
    # every disorder metric identically zero at every scale factor
    assert r["n_out_of_order"] > 0
    assert r["max_disorder_us"] > 0


def test_cluster_keeper_members_and_chars_consistent(spark, sf_dir):
    """The keeper is a member, every component has ≥2 members (it came
    from an edge), and chars_removed < the component's total chars."""
    from mi_inbound_pulsar_spark.operators.dedup import q_cluster_keeper

    for r in q_cluster_keeper(spark, sf_dir).collect():
        assert r["n_members"] >= 2
        assert r["keeper_doc_id"] is not None
        assert r["chars_removed"] > 0
