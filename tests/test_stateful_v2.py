"""Spark 4 stateful streaming surface: dropDuplicatesWithinWatermark
(bounded-state dedup — the at-scale form of streaming dedup) and
transformWithStateInPandas (the arbitrary-state API, RocksDB-backed)."""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import functions as F

RAW = "event_time string, msg_id string"
TS = "event_time timestamp, msg_id string"


def _write(spark, d, rows):
    (
        spark.createDataFrame(rows, RAW)
        .selectExpr("CAST(event_time AS TIMESTAMP) AS event_time", "msg_id")
        .coalesce(1)
        .write.mode("append")
        .parquet(d)
    )


def test_dropduplicates_within_watermark_bounds_state(spark):
    # Plain dropDuplicates keeps every key forever (unbounded state at
    # 100 TB). dropDuplicatesWithinWatermark dedups only while the key
    # is within the watermark window, then EVICTS — so a key can
    # legitimately reappear later. Both behaviors asserted.
    d = tempfile.mkdtemp(prefix="ddww_")
    _write(spark, d, [("2024-01-01 12:00:00", "m1")])

    stream = (
        spark.readStream.schema(TS)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .withWatermark("event_time", "10 minutes")
        .dropDuplicatesWithinWatermark(["msg_id"])
    )
    out: list = []
    q = stream.writeStream.foreachBatch(lambda df, e: out.extend(df.collect())).start()
    q.processAllAvailable()
    assert [r["msg_id"] for r in out] == ["m1"]

    # duplicate within the watermark window → suppressed
    _write(spark, d, [("2024-01-01 12:05:00", "m1")])
    q.processAllAvailable()
    assert [r["msg_id"] for r in out] == ["m1"]

    # advance the watermark far past m1's window → its state evicts
    _write(spark, d, [("2024-01-01 13:00:00", "s1")])
    q.processAllAvailable()

    # the same business key arrives again much later → re-emitted
    # (bounded state traded for windowed dedup, the documented contract)
    _write(spark, d, [("2024-01-01 13:05:00", "m1")])
    q.processAllAvailable()
    q.stop()
    ids = [r["msg_id"] for r in out]
    assert ids.count("m1") == 2
    assert ids.count("s1") == 1


def test_transform_with_state_running_counter(spark):
    # transformWithStateInPandas: per-key ValueState surviving across
    # micro-batches (RocksDB provider) — the arbitrary-state successor
    # to applyInPandasWithState; shape: per-key message counter.
    # The API's state-server protocol needs google.protobuf, which this
    # container lacks — skip there (applyInPandasWithState, which has no
    # such dependency, carries the arbitrary-state coverage in
    # tests/test_chunking.py).
    #
    # REQUIREMENTS NOTE (why this stays skipped here): the container
    # cannot take protobuf. (a) installs are prohibited AND there is no
    # network — `pip download protobuf` exits without fetching anything;
    # (b) no protobuf wheel/sdist exists anywhere on disk (verified:
    # only typeshed stubs and pyspark's .proto sources); (c) vendoring
    # is not viable: pyspark's generated *_pb2 modules need the real
    # runtime's C-or-pure descriptor pool (google.protobuf.descriptor),
    # ~10k lines that cannot be faithfully reimplemented here. On any
    # machine with `pip install protobuf` this test runs as-is.
    import pytest

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState needs protobuf (not in container; "
        "no network + installs prohibited — see note above)",
    )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self._count = handle.getValueState("count", "n long")

        def handleInputRows(self, key, rows, timerValues):
            total = sum(len(pdf) for pdf in rows)
            prev = self._count.get()[0] if self._count.exists() else 0
            self._count.update((prev + total,))
            yield pd.DataFrame({"msg_id": [key[0]], "n": [prev + total]})

        def close(self):
            pass

    d = tempfile.mkdtemp(prefix="tws_")
    _write(spark, d, [("2024-01-01 12:00:00", "a"), ("2024-01-01 12:00:01", "b")])

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(TS).option("maxFilesPerTrigger", 1).parquet(d)
        )
        counted = stream.groupBy("msg_id").transformWithStateInPandas(
            CountProcessor(),
            outputStructType="msg_id string, n long",
            outputMode="Update",
            timeMode="None",
        )
        latest: dict = {}

        def sink(df, epoch):
            for r in df.collect():
                latest[r["msg_id"]] = r["n"]

        q = counted.writeStream.outputMode("update").foreachBatch(sink).start()
        q.processAllAvailable()
        assert latest == {"a": 1, "b": 1}

        # second batch: state persists per key across batches
        _write(spark, d, [("2024-01-01 12:01:00", "a"), ("2024-01-01 12:01:01", "a")])
        q.processAllAvailable()
        q.stop()
        assert latest == {"a": 3, "b": 1}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
