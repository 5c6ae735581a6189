"""Live streaming test for the keyed top-k leaderboard: standings must
merge across micro-batches (an early record can stay on the board)."""

from __future__ import annotations

import tempfile

from mi_inbound_pulsar_spark.streaming.topk import topk_stream

RAW = "event_type string, event_id long, value double"


def _write(spark, staging, rows):
    spark.createDataFrame(rows, RAW).coalesce(1).write.mode("append").parquet(staging)


def test_topk_leaderboard_merges_across_batches(spark):
    staging = tempfile.mkdtemp(prefix="pulsar_topk_test_")
    batch1 = [("a", 1, 50.0), ("a", 2, 90.0), ("a", 3, 10.0), ("b", 4, 5.0)]
    batch2 = [("a", 5, 70.0), ("a", 6, 20.0), ("b", 7, 3.0)]
    _write(spark, staging, batch1)

    stream = (
        spark.readStream.schema(RAW).option("maxFilesPerTrigger", 1).parquet(staging)
    )
    emitted: list = []

    def sink(df, epoch):
        emitted.append(df.collect())

    q = topk_stream(stream, k=2).writeStream.outputMode("append").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        _write(spark, staging, batch2)
        q.processAllAvailable()
    finally:
        q.stop()

    batches = [b for b in emitted if b]
    assert len(batches) == 2
    first = {(r.event_type, r.rank): (r.event_id, r.value) for r in batches[0]}
    assert first[("a", 1)] == (2, 90.0) and first[("a", 2)] == (1, 50.0)
    assert first[("b", 1)] == (4, 5.0)
    # after batch 2: event 2 (batch 1) must STILL lead; 5 displaces 1
    final = {(r.event_type, r.rank): (r.event_id, r.value) for r in batches[1]}
    assert final[("a", 1)] == (2, 90.0)
    assert final[("a", 2)] == (5, 70.0)
    assert final[("b", 1)] == (4, 5.0) and final[("b", 2)] == (7, 3.0)
