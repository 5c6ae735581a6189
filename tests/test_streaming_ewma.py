"""Live streaming test for the keyed EWMA stateful operator: the
accumulator must survive micro-batch boundaries so the streamed series
equals the batch fold over the full history."""

from __future__ import annotations

import tempfile

from mi_inbound_pulsar_spark.streaming.ewma import ewma_stream

RAW = "user_id long, event_time string, value double"


def _write(spark, staging, rows):
    (
        spark.createDataFrame(rows, RAW)
        .selectExpr("user_id", "CAST(event_time AS TIMESTAMP) AS event_time", "value")
        .coalesce(1)
        .write.mode("append")
        .parquet(staging)
    )


def test_ewma_state_carries_across_batches(spark):
    staging = tempfile.mkdtemp(prefix="pulsar_ewma_test_")
    batch1 = [
        (1, "2024-01-01 10:00:00", 10.0),
        (1, "2024-01-01 10:01:00", 20.0),
        (2, "2024-01-01 10:00:30", 5.0),
    ]
    batch2 = [
        (1, "2024-01-01 10:02:00", 30.0),
        (2, "2024-01-01 10:03:00", 15.0),
        (2, "2024-01-01 10:04:00", 25.0),
    ]
    _write(spark, staging, batch1)

    stream = (
        spark.readStream.schema("user_id long, event_time timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    got: list = []

    def sink(df, epoch):
        got.extend(df.collect())

    q = ewma_stream(stream, alpha=0.2).writeStream.outputMode("append").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        _write(spark, staging, batch2)
        q.processAllAvailable()
    finally:
        q.stop()

    # python reference: fold per key over the full, cross-batch history
    alpha = 0.2
    expected: dict[tuple[int, str], float] = {}
    acc: dict[int, float] = {}
    for uid, ts, v in batch1 + batch2:
        acc[uid] = v if uid not in acc else alpha * v + (1 - alpha) * acc[uid]
        expected[(uid, ts)] = acc[uid]

    assert len(got) == len(expected)
    for r in got:
        key = (r.user_id, r.event_time.strftime("%Y-%m-%d %H:%M:%S"))
        assert abs(r.ewma - expected[key]) < 1e-12, key
    # the cross-batch carry is the point: user 1's batch-2 row must
    # reflect batch-1 state, not a fresh seed
    u1_final = [r for r in got if r.user_id == 1][-1]
    assert abs(u1_final.ewma - (0.2 * 30.0 + 0.8 * (0.2 * 20.0 + 0.8 * 10.0))) < 1e-12
