"""Pulsar-shaped source abstraction.

Two backends behind one record schema (SURVEY.md §1.4):

1. **Connector-backed** (`open_stream`): when a live broker + the
   public StreamNative pulsar-spark connector are available,
   ``spark.readStream.format("pulsar").options(**cfg.to_reader_options())``.
   Not available in this test environment (BASELINE.json: broker is
   external), so the call raises with instructions unless the format is
   registered.

2. **File-backed simulator** (`simulated_message_frame` /
   `simulated_stream`): a deterministic message frame derived from the
   ``events`` table, with the exact column schema a Pulsar source
   emits — value, topic, message_id, key, redelivery_count,
   properties, event_time, publish_time (FIXTURES.md §A, mirroring
   PulsarUtils.java:121-130). The streaming variant replays it through
   a file source so watermark/window/delivery tests drive a *real*
   Structured Streaming query.

Subscription semantics implemented on the frame (SURVEY.md §2A):

- S1 multi-topic: the frame spans 3 topics; ``topics`` filters to the
  subscribed list (union-of-streams semantics).
- S2 regex subscribe: ``topics_pattern`` filters with ``rlike``.
- S16 readCompacted: latest-value-per-key view via ``max_by``.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.config import PulsarSourceConfig
from mi_inbound_pulsar_spark.sources.tables import load_table

#: Pulsar message record schema (FIXTURES.md §A / SURVEY.md §1.4).
MESSAGE_SCHEMA = (
    "value string, topic string, message_id string, key string, "
    "redelivery_count int, properties map<string,string>, "
    "event_time timestamp, publish_time timestamp"
)


def simulated_message_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic message frame derived from the events table.

    The derivation is pure column arithmetic so the DuckDB oracle can
    reproduce it exactly (operators/ingestion.py):

    - 3 topics keyed by ``event_id % 3``
    - ~10% null keys (``user_id % 10 == 0``), matching FIXTURES.md §A
    - sparse redelivery_count with some rows ≥ the DLQ default of 5
    - the JSON ``props`` string is the payload (content type JSON)
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("props").alias("value"),
        F.concat(F.lit("persistent://public/default/t"), (F.col("event_id") % 3).cast("string")).alias(
            "topic"
        ),
        F.col("event_id").cast("string").alias("message_id"),
        F.when(F.col("user_id") % 10 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("user-"), F.col("user_id").cast("string")))
        .alias("key"),
        F.when(
            F.col("event_id") % 17 == 0,
            (F.floor(F.col("event_id") / 17) % 8).cast("int"),
        )
        .otherwise(F.lit(0))
        .alias("redelivery_count"),
        F.create_map(
            F.lit("event_type"),
            F.col("event_type"),
            F.lit("uid"),
            F.col("user_id").cast("string"),
        ).alias("properties"),
        F.col("ts").alias("event_time"),
        (F.col("ts") + F.expr("INTERVAL 1 SECOND")).alias("publish_time"),
    )


def subscribe(frame: DataFrame, cfg: PulsarSourceConfig) -> DataFrame:
    """Apply subscription semantics (S1/S2/S16) to a message frame."""
    from mi_inbound_pulsar_spark.config import RegexSubscriptionMode

    out = frame
    if cfg.topics:
        out = out.filter(F.col("topic").isin(cfg.topics))  # S1
    elif cfg.topics_pattern:
        # S2 — a regex subscription is scoped by topic domain BEFORE the
        # pattern applies (PulsarMessageConsumer.java:368-376)
        if cfg.regex_subscription_mode is RegexSubscriptionMode.PERSISTENT_ONLY:
            out = out.filter(F.col("topic").startswith("persistent://"))
        elif cfg.regex_subscription_mode is RegexSubscriptionMode.NON_PERSISTENT_ONLY:
            out = out.filter(F.col("topic").startswith("non-persistent://"))
        out = out.filter(F.col("topic").rlike(cfg.topics_pattern))
    if cfg.read_compacted:
        # S16 — latest value per key (null-keyed messages are not compacted
        # away; Pulsar retains them, so we keep them all).
        keyed = out.filter(F.col("key").isNotNull())
        latest = (
            keyed.groupBy("key")
            .agg(F.max_by(F.struct(*out.columns), F.col("message_id").cast("long")).alias("m"))
            .select("m.*")
        )
        out = latest.unionByName(out.filter(F.col("key").isNull()))
    return out


def key_shared_repartition(frame: DataFrame, num_partitions: int) -> DataFrame:
    """S4 — Key_Shared subscription semantics
    (PulsarMessageConsumer.java:378-386): every message of a key is
    processed by one consumer, in order. Spark restatement: hash
    repartition on the key (all rows of a key → one partition ≙ one
    task ≙ one "consumer") + per-partition sort by message id. Per-key
    order is guaranteed; global order is not — exactly Pulsar's
    Key_Shared contract.
    """
    return frame.repartition(num_partitions, F.col("key")).sortWithinPartitions(
        F.col("key"), F.col("message_id").cast("long")
    )


def simulated_stream(
    spark: SparkSession,
    sf_dir: str,
    cfg: PulsarSourceConfig | None = None,
    staging_dir: str | None = None,
    files: int = 8,
) -> DataFrame:
    """Streaming DataFrame replaying the simulated frame via a file source.

    The frame is staged as ``files`` parquet files and read with
    ``maxFilesPerTrigger=1`` so a query sees multiple micro-batches —
    enough to exercise watermarks, stateful ops, and delivery
    semantics. ``processAllAvailable()`` drains it deterministically.

    S5 — initial position (PulsarMessageConsumer.java:271-273): with
    ``Earliest`` the backlog (the staged frame) is consumed; with
    ``Latest`` the subscription starts at the head — the staging dir
    starts empty and only messages *published after subscribe* (via
    :func:`publish_frame`) are delivered. Mirrors a durable
    subscription created at the topic head.
    """
    from mi_inbound_pulsar_spark.config import SubscriptionInitialPosition

    from_latest = cfg is not None and cfg.initial_position is SubscriptionInitialPosition.LATEST
    if staging_dir is None and from_latest:
        # 'start at head' must not replay stale files a prior Earliest
        # run left in the shared default staging dir — use a fresh one
        staging = tempfile.mkdtemp(prefix=f"pulsar_sim_latest_{os.path.basename(sf_dir)}_")
    else:
        staging = staging_dir or os.path.join(
            tempfile.gettempdir(), f"pulsar_sim_{os.path.basename(sf_dir)}"
        )
    if from_latest:
        os.makedirs(staging, exist_ok=True)  # empty topic head
    else:
        frame = simulated_message_frame(spark, sf_dir)
        if cfg is not None:
            frame = subscribe(frame, cfg)
        publish_frame(frame, staging, files=files, mode="overwrite")
    return (
        spark.readStream.schema(MESSAGE_SCHEMA).option("maxFilesPerTrigger", 1).parquet(staging)
    )


def publish_frame(
    frame: DataFrame, staging_dir: str, files: int = 1, mode: str = "append"
) -> None:
    """Publish messages to a simulated topic (append parquet files the
    running stream will pick up — S17 partition/file discovery)."""
    # Order by event_time so file-by-file replay approximates arrival order.
    (
        frame.orderBy("event_time")
        .repartitionByRange(files, "event_time")
        .write.mode(mode)
        .parquet(staging_dir)
    )


def open_stream(spark: SparkSession, cfg: PulsarSourceConfig) -> DataFrame:
    """Connector-backed source (requires a live broker + connector jar)."""
    try:
        return (
            spark.readStream.format("pulsar").options(**cfg.to_reader_options()).load()
        )
    except Exception as exc:  # pragma: no cover - no broker in test env
        raise RuntimeError(
            "pulsar connector not available in this environment; use "
            "simulated_stream() (same schema) or add the StreamNative "
            "pulsar-spark connector jar + a live broker"
        ) from exc
