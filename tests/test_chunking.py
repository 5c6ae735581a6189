"""S15 chunk-reassembly tests: batch equivalence, streaming stateful
reassembly across micro-batches, idempotence under replay, and the
incomplete-chunk expiry branch (driven directly through the state fn)."""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators.ingestion import chunked_document_frame
from mi_inbound_pulsar_spark.sources.tables import load_table
from mi_inbound_pulsar_spark.streaming.chunking import (
    make_reassembler,
    reassemble_batch,
    reassemble_stream,
)

CHUNK_SCHEMA = "chunk_uuid string, chunk_index int, total_chunks int, fragment string"


def test_batch_reassembly_roundtrips_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = reassemble_batch(chunked_document_frame(spark, sf_dir))
    joined = out.join(
        docs.select(F.col("doc_id").cast("string").alias("chunk_uuid"), "text"), "chunk_uuid"
    )
    assert joined.count() == docs.count()
    assert joined.filter(F.col("payload") != F.col("text")).count() == 0


def test_batch_reassembly_drops_incomplete(spark):
    rows = [
        ("a", 0, 2, "he"), ("a", 1, 2, "llo"),  # complete
        ("b", 0, 3, "x"), ("b", 2, 3, "z"),     # missing index 1
    ]
    out = reassemble_batch(spark.createDataFrame(rows, CHUNK_SCHEMA)).collect()
    assert {(r["chunk_uuid"], r["payload"]) for r in out} == {("a", "hello")}


def test_streaming_reassembly_across_microbatches(spark):
    # fragments of one message arrive in different micro-batches; the
    # stateful operator must hold partial state and emit exactly once
    staging = tempfile.mkdtemp(prefix="chunk_stream_")
    b1 = [("m1", 0, 3, "AA"), ("m2", 0, 2, "xx"), ("m1", 2, 3, "CC")]
    b2 = [("m1", 1, 3, "BB"), ("m2", 1, 2, "yy")]
    spark.createDataFrame(b1, CHUNK_SCHEMA).coalesce(1).write.mode("append").parquet(staging)

    stream = spark.readStream.schema(CHUNK_SCHEMA).option("maxFilesPerTrigger", 1).parquet(staging)
    out = reassemble_stream(stream)
    results: list = []

    def sink(df, epoch):
        results.extend((r["chunk_uuid"], r["n_chunks"], r["payload"]) for r in df.collect())

    q = out.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    assert results == []  # nothing complete yet
    spark.createDataFrame(b2, CHUNK_SCHEMA).coalesce(1).write.mode("append").parquet(staging)
    q.processAllAvailable()
    q.stop()
    assert sorted(results) == [("m1", 3, "AABBCC"), ("m2", 2, "xxyy")]


class FakeState:
    """Minimal GroupState stand-in for direct unit tests."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def _pdf(rows):
    return iter(
        [pd.DataFrame(rows, columns=["chunk_uuid", "chunk_index", "total_chunks", "fragment"])]
    )


def test_reassembler_duplicate_fragments_are_idempotent():
    # at-least-once replay re-delivers fragment 0; it must not corrupt
    fn = make_reassembler()
    state = FakeState()
    list(fn(("m",), _pdf([("m", 0, 2, "ab"), ("m", 0, 2, "ab")]), state))
    assert state.get == ([0], ["ab"], 2)
    out = list(fn(("m",), _pdf([("m", 1, 2, "cd")]), state))
    assert out[0]["payload"][0] == "abcd"
    assert state.removed


def test_reassembler_expiry_drops_incomplete_state():
    # ≙ expiryTimeOfIncompleteChunkedMessageMillis: timed-out group is
    # discarded without emitting (PulsarMessageConsumer.java:326-336)
    fn = make_reassembler(expiry_ms=5000)
    state = FakeState()
    list(fn(("m",), _pdf([("m", 0, 3, "a")]), state))
    assert state.timeout_ms == 5000  # armed
    timed_out = FakeState(value=([0], ["a"], 3), timed_out=True)
    out = list(fn(("m",), iter([]), timed_out))
    assert out == [] and timed_out.removed


def test_out_of_order_fragments_sort_correctly():
    fn = make_reassembler()
    state = FakeState()
    out = list(fn(("m",), _pdf([("m", 2, 3, "C"), ("m", 0, 3, "A"), ("m", 1, 3, "B")]), state))
    assert out[0]["payload"][0] == "ABC"


def test_streaming_reassembly_on_rocksdb_state_store(spark):
    # same cross-batch contract on the RocksDB state store provider —
    # the production backend (bounded heap, state spills to disk,
    # changelog checkpointing at scale). applyInPandasWithState must
    # behave identically to the default HDFS-backed store.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        staging = tempfile.mkdtemp(prefix="chunk_rocks_")
        b1 = [("m1", 0, 3, "AA"), ("m1", 2, 3, "CC")]
        b2 = [("m1", 1, 3, "BB")]
        spark.createDataFrame(b1, CHUNK_SCHEMA).coalesce(1).write.mode("append").parquet(staging)
        stream = spark.readStream.schema(CHUNK_SCHEMA).option("maxFilesPerTrigger", 1).parquet(staging)
        results: list = []
        q = (
            reassemble_stream(stream)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, e: results.extend(
                (r["chunk_uuid"], r["payload"]) for r in df.collect()
            ))
            .start()
        )
        q.processAllAvailable()
        assert results == []
        spark.createDataFrame(b2, CHUNK_SCHEMA).coalesce(1).write.mode("append").parquet(staging)
        q.processAllAvailable()
        q.stop()
        assert results == [("m1", "AABBCC")]
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
