"""Structured Streaming tests — a *real* streaming query over the
file-backed simulator (multi-micro-batch replay), covering streaming
dedup, watermark + tumbling window, and foreachBatch pipeline dispatch
with at-least-once accounting (SURVEY.md §2A S7/S10, K1-K4)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.sources.pulsar_source import (
    MESSAGE_SCHEMA,
    simulated_message_frame,
    simulated_stream,
)
from mi_inbound_pulsar_spark.streaming.delivery import PipelineRegistry, run_pipeline


def test_simulated_stream_replays_all_messages(spark, sf_dir):
    staging = tempfile.mkdtemp(prefix="pulsar_sim_test_")
    stream = simulated_stream(spark, sf_dir, staging_dir=staging, files=4)
    assert stream.isStreaming
    batches: list[int] = []

    def sink(df, epoch):
        batches.append(df.count())

    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    expected = simulated_message_frame(spark, sf_dir).count()
    assert sum(batches) == expected
    # maxFilesPerTrigger=1 over 4 files → a real micro-batch sequence
    assert len([b for b in batches if b > 0]) >= 2


def test_streaming_dedup_by_message_id(spark, sf_dir):
    # S10/streaming dedup: duplicate the staged frame, dropDuplicates on
    # the message id must collapse replays (at-least-once → effectively-once)
    staging = tempfile.mkdtemp(prefix="pulsar_dup_test_")
    frame = simulated_message_frame(spark, sf_dir).limit(500)
    frame.unionByName(frame).write.mode("overwrite").parquet(staging)
    stream = (
        spark.readStream.schema(MESSAGE_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(staging)
        .dropDuplicates(["message_id"])
    )
    seen: list = []

    def sink(df, epoch):
        seen.extend(df.select("message_id").toPandas()["message_id"])

    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    assert len(seen) == len(set(seen)) == 500


def test_watermark_tumbling_window_counts(spark, sf_dir):
    # tumbling window + watermark on the streaming frame; update-mode
    # counts must reconcile with the batch computation. The watermark
    # delay exceeds the frame's event-time span, so no row can be
    # dropped regardless of the (unordered) file replay order — file
    # sources don't guarantee range order, late-drop is tested
    # deterministically in test_late_data_dropped_after_watermark.
    staging = tempfile.mkdtemp(prefix="pulsar_wm_test_")
    stream = simulated_stream(spark, sf_dir, staging_dir=staging, files=4)
    agg = (
        stream.withWatermark("event_time", "365 days")
        .groupBy(F.window("event_time", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    final: dict = {}

    def sink(df, epoch):
        for r in df.collect():
            final[r["w"]["start"]] = r["n"]  # update mode: last write wins

    q = agg.writeStream.outputMode("update").foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    batch = (
        simulated_message_frame(spark, sf_dir)
        .groupBy(F.window("event_time", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expected = {r["w"]["start"]: r["n"] for r in batch}
    assert final == expected


def test_late_data_dropped_after_watermark(spark):
    # deterministic late-data drop: file B (an hours-late event) is
    # written only after the query has fully processed file A, so the
    # watermark is already past it — the late row must be discarded
    # (SURVEY.md §2B streaming: watermark + late-data drop)
    import os
    import time

    staging = tempfile.mkdtemp(prefix="pulsar_late_test_")
    raw_schema = "event_time string, k string"
    ts_schema = "event_time timestamp, k string"
    on_time = spark.createDataFrame(
        [("2024-01-01 12:00:00", "a"), ("2024-01-01 12:59:00", "a")], raw_schema
    ).selectExpr("CAST(event_time AS TIMESTAMP) AS event_time", "k")
    on_time.coalesce(1).write.mode("append").parquet(staging)

    stream = spark.readStream.schema(ts_schema).option("maxFilesPerTrigger", 1).parquet(staging)
    agg = (
        stream.withWatermark("event_time", "10 minutes")
        .groupBy(F.window("event_time", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    final: dict = {}

    def sink(df, epoch):
        for r in df.collect():
            final[r["w"]["start"]] = r["n"]

    q = agg.writeStream.outputMode("update").foreachBatch(sink).start()
    q.processAllAvailable()  # watermark now 12:59 - 10min = 12:49
    time.sleep(0.5)
    late = spark.createDataFrame([("2024-01-01 10:30:00", "a")], raw_schema).selectExpr(
        "CAST(event_time AS TIMESTAMP) AS event_time", "k"
    )
    late.coalesce(1).write.mode("append").parquet(staging)
    q.processAllAvailable()
    q.stop()

    import datetime

    noon = datetime.datetime(2024, 1, 1, 12, 0)
    late_window = datetime.datetime(2024, 1, 1, 10, 0)
    assert final[noon] == 2
    assert late_window not in final  # dropped: older than the watermark


def test_run_pipeline_dispatch_and_error_route(spark, sf_dir):
    # K1 dispatch + K2 error route over a live stream
    staging = tempfile.mkdtemp(prefix="pulsar_k1_test_")
    stream = simulated_stream(spark, sf_dir, staging_dir=staging, files=2)
    ok_batches: list[int] = []
    err_batches: list[int] = []
    reg = PipelineRegistry()

    def flaky(df, epoch):
        if epoch == 0:
            raise RuntimeError("downstream failure")
        ok_batches.append(df.count())

    reg.register("ingest", flaky)
    q = run_pipeline(
        stream,
        reg,
        "ingest",
        on_error=lambda df, epoch: err_batches.append(df.count()),
        query_name="k1-test",
    )
    q.processAllAvailable()
    q.stop()
    assert len(err_batches) == 1  # epoch 0 routed to the error sink (K2)
    assert sum(ok_batches) + sum(err_batches) == simulated_message_frame(spark, sf_dir).count()


def test_run_pipeline_unknown_name_fails_at_start(spark, sf_dir):
    import pytest

    staging = tempfile.mkdtemp(prefix="pulsar_k1b_test_")
    stream = simulated_stream(spark, sf_dir, staging_dir=staging, files=2)
    with pytest.raises(KeyError):
        run_pipeline(stream, PipelineRegistry(), "missing-seq")


def test_checkpoint_recovery_is_exactly_once(spark):
    # K3/K4 delivery proof: a checkpointed query killed and restarted
    # must resume from the committed offset — every input row lands in
    # the sink exactly once across the two runs
    import shutil

    src = tempfile.mkdtemp(prefix="ckpt_src_")
    sink_dir = tempfile.mkdtemp(prefix="ckpt_sink_") + "/out"
    ckpt = tempfile.mkdtemp(prefix="ckpt_meta_")

    def write_batch(lo, hi):
        spark.range(lo, hi).selectExpr("id", "id * 2 AS doubled").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write_batch(0, 100)
    write_batch(100, 200)

    def start():
        return (
            spark.readStream.schema("id long, doubled long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()  # "crash" after committing the first two files

    write_batch(200, 300)  # backlog grows while the query is down
    q = start()  # restart from the SAME checkpoint
    q.processAllAvailable()
    q.stop()

    out = spark.read.parquet(sink_dir)
    assert out.count() == 300  # no duplicates, no loss
    assert out.select("id").distinct().count() == 300
    shutil.rmtree(ckpt, ignore_errors=True)


def test_trigger_available_now_drains_and_stops(spark, sf_dir):
    # availableNow: process the whole backlog in rate-limited batches,
    # then stop on its own — the scheduled-incremental-job mode
    staging = tempfile.mkdtemp(prefix="avnow_")
    stream = simulated_stream(spark, sf_dir, staging_dir=staging, files=3)
    batches: list[int] = []
    q = (
        stream.writeStream.foreachBatch(lambda df, e: batches.append(df.count()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)  # self-terminates once the backlog drains
    assert not q.isActive
    expected = simulated_message_frame(spark, sf_dir).count()
    assert sum(batches) == expected
    assert len([b for b in batches if b > 0]) >= 2  # still micro-batched
