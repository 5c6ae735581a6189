"""S5 Earliest/Latest subscription-position semantics and stream-stream
joins (SURVEY.md §2B streaming row)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.config import PulsarSourceConfig, SubscriptionInitialPosition
from mi_inbound_pulsar_spark.sources.pulsar_source import (
    publish_frame,
    simulated_message_frame,
    simulated_stream,
)


def _drain(stream, sink):
    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    return q


def test_earliest_consumes_backlog(spark, sf_dir):
    staging = tempfile.mkdtemp(prefix="pos_earliest_")
    cfg = PulsarSourceConfig(
        service_url="pulsar://sim:6650",
        topics_pattern=".*",
        initial_position=SubscriptionInitialPosition.EARLIEST,
    )
    stream = simulated_stream(spark, sf_dir, cfg=cfg, staging_dir=staging, files=2)
    seen: list[int] = []
    q = _drain(stream, lambda df, e: seen.append(df.count()))
    q.stop()
    assert sum(seen) == simulated_message_frame(spark, sf_dir).count()


def test_latest_skips_backlog_sees_new_publishes(spark, sf_dir):
    # S5 Latest: the pre-existing backlog is never delivered; messages
    # published after subscribe are
    staging = tempfile.mkdtemp(prefix="pos_latest_")
    backlog = simulated_message_frame(spark, sf_dir).limit(400)
    publish_frame(backlog, staging + "_ignored")  # backlog lives elsewhere

    cfg = PulsarSourceConfig(
        service_url="pulsar://sim:6650",
        topics_pattern=".*",
        initial_position=SubscriptionInitialPosition.LATEST,
    )
    stream = simulated_stream(spark, sf_dir, cfg=cfg, staging_dir=staging)
    seen: list[int] = []
    q = _drain(stream, lambda df, e: seen.append(df.count()))
    assert sum(seen) == 0  # nothing before the first publish
    new_msgs = simulated_message_frame(spark, sf_dir).limit(100)
    publish_frame(new_msgs, staging)
    q.processAllAvailable()
    q.stop()
    assert sum(seen) == 100


def test_stream_stream_join_within_interval(spark, sf_dir):
    # stream-stream inner join: purchase events joined to click events
    # of the same user within [-1h, 0]. Watermarks bound join state; the
    # delay is set beyond the fixture's event-time span because the file
    # replay is not event-ordered across files (a tight watermark would
    # nondeterministically drop out-of-order rows — the late-drop path
    # is covered deterministically in test_late_data_dropped_after_watermark)
    staging = tempfile.mkdtemp(prefix="ss_join_")
    stream = simulated_stream(spark, sf_dir, staging_dir=staging, files=3)

    clicks = (
        stream.filter(F.col("properties")["event_type"] == "click")
        .select(
            F.col("key").alias("c_key"),
            F.col("event_time").alias("c_time"),
            F.col("message_id").alias("c_id"),
        )
        .withWatermark("c_time", "365 days")
    )
    purchases = (
        stream.filter(F.col("properties")["event_type"] == "purchase")
        .select(
            F.col("key").alias("p_key"),
            F.col("event_time").alias("p_time"),
            F.col("message_id").alias("p_id"),
        )
        .withWatermark("p_time", "365 days")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_key") == F.col("c_key"))
        & F.col("c_time").between(F.col("p_time") - F.expr("INTERVAL 1 HOUR"), F.col("p_time")),
    )
    pairs: set = set()
    q = joined.writeStream.foreachBatch(
        lambda df, e: pairs.update((r["p_id"], r["c_id"]) for r in df.collect())
    ).start()
    q.processAllAvailable()
    q.stop()

    # batch truth over the same frame
    m = simulated_message_frame(spark, sf_dir)
    c = m.filter(F.col("properties")["event_type"] == "click").select(
        F.col("key").alias("c_key"), F.col("event_time").alias("c_time"), F.col("message_id").alias("c_id")
    )
    p = m.filter(F.col("properties")["event_type"] == "purchase").select(
        F.col("key").alias("p_key"), F.col("event_time").alias("p_time"), F.col("message_id").alias("p_id")
    )
    truth = {
        (r["p_id"], r["c_id"])
        for r in p.join(
            c,
            (F.col("p_key") == F.col("c_key"))
            & F.col("c_time").between(F.col("p_time") - F.expr("INTERVAL 1 HOUR"), F.col("p_time")),
        ).collect()
    }
    assert pairs == truth
    assert len(truth) > 0


def test_latest_default_staging_ignores_stale_backlog(spark, sf_dir):
    """S5 — a Latest subscription on the DEFAULT staging dir must not
    replay parquet a prior Earliest run staged there ('start at head')."""
    # a prior Earliest-style run stages the backlog into the shared default dir
    simulated_stream(spark, sf_dir, files=1)
    cfg = PulsarSourceConfig(
        service_url="pulsar://sim:6650",
        topics_pattern=".*",
        initial_position=SubscriptionInitialPosition.LATEST,
    )
    stream = simulated_stream(spark, sf_dir, cfg=cfg)  # no explicit staging_dir
    seen: list[int] = []
    q = _drain(stream, lambda df, e: seen.append(df.count()))
    q.stop()
    assert sum(seen) == 0


def test_regex_subscription_mode_scopes_topic_domain(spark, sf_dir):
    """S2 — PersistentOnly/NonPersistentOnly scope the topic set before
    the pattern applies (PulsarMessageConsumer.java:368-376)."""
    from mi_inbound_pulsar_spark.config import RegexSubscriptionMode
    from mi_inbound_pulsar_spark.sources.pulsar_source import subscribe

    frame = simulated_message_frame(spark, sf_dir)
    # rewrite one topic to the non-persistent domain
    mixed = frame.withColumn(
        "topic",
        F.when(
            F.col("topic").endswith("t0"),
            F.regexp_replace("topic", "^persistent://", "non-persistent://"),
        ).otherwise(F.col("topic")),
    )
    base = dict(service_url="pulsar://sim:6650", topics_pattern=".*")
    pers = subscribe(
        mixed,
        PulsarSourceConfig(
            **base, regex_subscription_mode=RegexSubscriptionMode.PERSISTENT_ONLY
        ),
    )
    nonp = subscribe(
        mixed,
        PulsarSourceConfig(
            **base, regex_subscription_mode=RegexSubscriptionMode.NON_PERSISTENT_ONLY
        ),
    )
    allt = subscribe(
        mixed,
        PulsarSourceConfig(**base, regex_subscription_mode=RegexSubscriptionMode.ALL_TOPICS),
    )
    n_t0 = mixed.filter(F.col("topic").startswith("non-persistent://")).count()
    assert n_t0 > 0
    assert nonp.count() == n_t0
    assert pers.count() == mixed.count() - n_t0
    assert allt.count() == mixed.count()
