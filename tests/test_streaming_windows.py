"""Live Structured Streaming window tests: session_window that merges
across micro-batches and closes when the watermark passes the gap
(append mode), and a sliding-window update-mode reconcile vs batch.

Files are staged in phases (write → processAllAvailable → write)
because file sources don't replay in event-time order."""

from __future__ import annotations

import datetime
import tempfile

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.sources.pulsar_source import (
    simulated_message_frame,
    simulated_stream,
)

RAW = "event_time string, k string"


def _write(spark, staging, rows):
    (
        spark.createDataFrame(rows, RAW)
        .selectExpr("CAST(event_time AS TIMESTAMP) AS event_time", "k")
        .coalesce(1)
        .write.mode("append")
        .parquet(staging)
    )


def test_session_window_merges_across_batches_and_closes(spark):
    staging = tempfile.mkdtemp(prefix="pulsar_sess_test_")
    _write(spark, staging, [("2024-01-01 12:00:00", "a"), ("2024-01-01 12:02:00", "a")])

    stream = (
        spark.readStream.schema("event_time timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    agg = (
        stream.withWatermark("event_time", "10 minutes")
        .groupBy(F.session_window("event_time", "5 minutes").alias("s"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    closed: list = []

    def sink(df, epoch):
        closed.extend(df.collect())

    # append mode: a session row is emitted only once, when the
    # watermark passes session_end + gap — exactly-once session output
    q = agg.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    assert closed == []  # session still open

    # second batch extends the same session (cross-batch state merge)
    _write(spark, staging, [("2024-01-01 12:03:00", "a")])
    q.processAllAvailable()
    assert closed == []

    # sentinel advances the watermark to 12:50 → session [12:00,12:08) closes
    _write(spark, staging, [("2024-01-01 13:00:00", "a")])
    q.processAllAvailable()
    q.stop()

    assert len(closed) == 1
    row = closed[0]
    assert row["k"] == "a"
    assert row["n"] == 3  # 12:00 + 12:02 + 12:03 merged into one session
    assert row["s"]["start"] == datetime.datetime(2024, 1, 1, 12, 0)
    assert row["s"]["end"] == datetime.datetime(2024, 1, 1, 12, 8)  # last + gap


def test_sliding_window_stream_matches_batch(spark, sf_dir):
    # 1h window sliding every 30min over the simulated message stream;
    # update-mode final counts must reconcile with the batch plan
    staging = tempfile.mkdtemp(prefix="pulsar_slide_test_")
    stream = simulated_stream(spark, sf_dir, staging_dir=staging, files=4)
    agg = (
        stream.withWatermark("event_time", "365 days")
        .groupBy(F.window("event_time", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    final: dict = {}

    def sink(df, epoch):
        for r in df.collect():
            final[r["w"]["start"]] = r["n"]

    q = agg.writeStream.outputMode("update").foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()

    batch = (
        simulated_message_frame(spark, sf_dir)
        .groupBy(F.window("event_time", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expected = {r["w"]["start"]: r["n"] for r in batch}
    assert final == expected
    # every event lands in exactly 2 sliding windows
    assert sum(final.values()) == 2 * simulated_message_frame(spark, sf_dir).count()


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark):
    # Left-outer stream-stream join: the unmatched left row may only be
    # emitted once the global watermark (min of both streams) has passed
    # its whole join window — then it appears exactly once, with nulls.
    l_dir = tempfile.mkdtemp(prefix="ss_left_")
    r_dir = tempfile.mkdtemp(prefix="ss_right_")

    _write_l = lambda rows: (
        spark.createDataFrame(rows, "ad_time string, ad_key string, ad_id string")
        .selectExpr("CAST(ad_time AS TIMESTAMP) AS ad_time", "ad_key", "ad_id")
        .coalesce(1).write.mode("append").parquet(l_dir)
    )
    _write_r = lambda rows: (
        spark.createDataFrame(rows, "click_time string, click_key string, click_id string")
        .selectExpr("CAST(click_time AS TIMESTAMP) AS click_time", "click_key", "click_id")
        .coalesce(1).write.mode("append").parquet(r_dir)
    )

    # ad1 will be clicked; ad2 never
    _write_l([("2024-01-01 12:00:00", "k1", "ad1"), ("2024-01-01 12:05:00", "k2", "ad2")])
    _write_r([("2024-01-01 12:10:00", "k1", "click1")])

    ads = (
        spark.readStream.schema("ad_time timestamp, ad_key string, ad_id string")
        .option("maxFilesPerTrigger", 1).parquet(l_dir)
        .withWatermark("ad_time", "10 minutes")
    )
    clicks = (
        spark.readStream.schema("click_time timestamp, click_key string, click_id string")
        .option("maxFilesPerTrigger", 1).parquet(r_dir)
        .withWatermark("click_time", "10 minutes")
    )
    joined = ads.join(
        clicks,
        (F.col("ad_key") == F.col("click_key"))
        & F.col("click_time").between(
            F.col("ad_time"), F.col("ad_time") + F.expr("INTERVAL 30 MINUTES")
        ),
        "leftOuter",
    )
    rows: list = []
    q = joined.writeStream.foreachBatch(lambda df, e: rows.extend(df.collect())).start()
    q.processAllAvailable()
    got = {(r["ad_id"], r["click_id"]) for r in rows}
    assert ("ad1", "click1") in got  # inner match emits immediately
    assert ("ad2", None) not in got  # outer result must wait for the watermark

    # sentinels on BOTH streams: global watermark = min(13:30) - 10min
    # = 13:20, past ad2's window end (12:35) → ad2 emits with nulls
    _write_l([("2024-01-01 13:30:00", "k9", "ad_sentinel")])
    _write_r([("2024-01-01 13:30:00", "k9", "click_sentinel")])
    q.processAllAvailable()
    q.stop()

    got = {(r["ad_id"], r["click_id"]) for r in rows}
    assert ("ad1", "click1") in got
    assert ("ad2", None) in got
    # exactly one outer row for ad2 (no duplicates across batches)
    assert sum(1 for r in rows if r["ad_id"] == "ad2") == 1


def test_zscore_window_and_pandas_forms_agree(spark, sf_dir):
    """The canonical window z-score and the grouped-map extension
    surface must produce identical rows."""
    from mi_inbound_pulsar_spark.operators.eventsops import (
        q_zscore_per_group,
        zscore_per_group_pandas,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    a = {tuple(r) for r in q_zscore_per_group(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events")
    b = {tuple(r) for r in zscore_per_group_pandas(e).collect()}
    assert a == b and len(a) > 0


def test_stream_stream_full_outer_emits_both_sides_unmatched(spark):
    # Full-outer stream-stream join: unmatched rows from BOTH sides emit
    # (with nulls) once the global watermark clears their join windows —
    # each exactly once.
    l_dir = tempfile.mkdtemp(prefix="ss_fo_l_")
    r_dir = tempfile.mkdtemp(prefix="ss_fo_r_")

    def wl(rows):
        (
            spark.createDataFrame(rows, "ad_time string, ad_key string, ad_id string")
            .selectExpr("CAST(ad_time AS TIMESTAMP) AS ad_time", "ad_key", "ad_id")
            .coalesce(1).write.mode("append").parquet(l_dir)
        )

    def wr(rows):
        (
            spark.createDataFrame(rows, "click_time string, click_key string, click_id string")
            .selectExpr("CAST(click_time AS TIMESTAMP) AS click_time", "click_key", "click_id")
            .coalesce(1).write.mode("append").parquet(r_dir)
        )

    # ad1/click1 match; ad2 unmatched left; click_orphan unmatched right
    wl([("2024-01-01 12:00:00", "k1", "ad1"), ("2024-01-01 12:05:00", "k2", "ad2")])
    wr([("2024-01-01 12:10:00", "k1", "click1"), ("2024-01-01 12:12:00", "k7", "click_orphan")])

    ads = (
        spark.readStream.schema("ad_time timestamp, ad_key string, ad_id string")
        .option("maxFilesPerTrigger", 1).parquet(l_dir)
        .withWatermark("ad_time", "10 minutes")
    )
    clicks = (
        spark.readStream.schema("click_time timestamp, click_key string, click_id string")
        .option("maxFilesPerTrigger", 1).parquet(r_dir)
        .withWatermark("click_time", "10 minutes")
    )
    joined = ads.join(
        clicks,
        (F.col("ad_key") == F.col("click_key"))
        & F.col("click_time").between(
            F.col("ad_time"), F.col("ad_time") + F.expr("INTERVAL 30 MINUTES")
        ),
        "fullOuter",
    )
    rows: list = []
    q = joined.writeStream.foreachBatch(lambda df, e: rows.extend(df.collect())).start()
    q.processAllAvailable()
    # advance the global watermark on both sides past every join window
    wl([("2024-01-01 13:30:00", "k9", "ad_sentinel")])
    wr([("2024-01-01 13:30:00", "k9", "click_sentinel")])
    q.processAllAvailable()
    q.stop()

    got = {(r["ad_id"], r["click_id"]) for r in rows}
    assert ("ad1", "click1") in got
    assert ("ad2", None) in got  # unmatched left
    assert (None, "click_orphan") in got  # unmatched right
    assert sum(1 for r in rows if r["ad_id"] == "ad2") == 1
    assert sum(1 for r in rows if r["click_id"] == "click_orphan" and r["ad_id"] is None) == 1


def test_watermark_calibration_quantity_is_the_drop_knob(spark):
    """q_watermark_calibration reports per-arrival disorder (lag behind
    the running max event time). This test pins the contract: a
    withWatermark delay ABOVE the observed max disorder keeps every
    late row; a delay below it drops the late row. Same stream, same
    arrival order, only the delay changes."""
    import pandas as pd  # noqa: F401  (parity with module imports)

    def run_with_delay(delay: str) -> int:
        staging = tempfile.mkdtemp(prefix="pulsar_wm_cal_")
        # arrival order: (12:00, 12:10) then a 9-minute-disordered 12:01
        _write(spark, staging, [("2024-01-01 12:00:00", "a"), ("2024-01-01 12:10:00", "a")])
        stream = (
            spark.readStream.schema("event_time timestamp, k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        agg = (
            stream.withWatermark("event_time", delay)
            .groupBy(F.window("event_time", "5 minutes").alias("w"), "k")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        out: list = []
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, epoch: out.extend(df.collect()))
            .start()
        )
        q.processAllAvailable()
        _write(spark, staging, [("2024-01-01 12:01:00", "a")])  # disorder = 9 min
        q.processAllAvailable()
        _write(spark, staging, [("2024-01-01 13:00:00", "a")])  # sentinel closes windows
        q.processAllAvailable()
        q.stop()
        return sum(r["n"] for r in out)

    # max observed disorder is 9 minutes (the q_watermark_calibration
    # measurement on this arrival sequence): delay 10min > 9min keeps
    # all 3 pre-sentinel events; 4min < 9min drops the late one
    assert run_with_delay("10 minutes") == 3
    assert run_with_delay("4 minutes") == 2
