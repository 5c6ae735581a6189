"""`pulsar_sim` — a custom source built on Spark 4's Python Data
Source API (the public extension point a connector author uses when no
JVM connector exists; the batch and streaming halves share one
deterministic message generator).

- Batch: ``spark.read.format("pulsar_sim").option("messages", N)`` —
  ``partitions()`` splits the id range so generation is executor-
  parallel (no driver materialization, no single-partition scan).
- Streaming: ``spark.readStream.format("pulsar_sim")`` — a stateful
  poll loop: each micro-batch advances the offset by ``rate`` ids
  until ``messages`` is exhausted, mirroring a message consumer
  draining a backlog (SURVEY §2A S7 poll loop / S10 batch receive;
  offsets ≙ message ids, checkpointable by the engine).

The generator is pure arithmetic on the message id (same scheme as
``simulated_message_frame``: 3 topics by id%3, ~10% null keys, sparse
redelivery counts), so tests can assert exact contents and the stream
is replay-deterministic from any offset.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SIM_SCHEMA = (
    "message_id string, topic string, key string, value string, "
    "redelivery_count int, event_time timestamp"
)

_EPOCH = datetime.datetime(2024, 1, 1)


def _gen(start: int, end: int) -> Iterator[tuple]:
    """Deterministic messages for ids [start, end) — pure arithmetic,
    so any executor (or replayed batch) regenerates identical rows."""
    for i in range(start, end):
        yield (
            str(i),
            f"persistent://public/default/t{i % 3}",
            None if i % 10 == 0 else f"user-{i % 97}",
            '{"k": %d}' % (i % 100),
            (i // 17) % 8 if i % 17 == 0 else 0,
            _EPOCH + datetime.timedelta(seconds=i),
        )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class PulsarSimBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("messages", 1000))
        self.n_parts = int(options.get("numPartitions", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _gen(partition.start, partition.end)


class PulsarSimStreamReader(DataSourceStreamReader):
    """Backlog-draining poll loop: offsets are message ids; every
    trigger admits at most ``rate`` ids (≙ batch receive policy)."""

    def __init__(self, options):
        self.total = int(options.get("messages", 1000))
        self.rate = int(options.get("rate", 100))
        self.n_parts = int(options.get("numPartitions", 4))
        self._current = 0

    def initialOffset(self):
        return {"id": 0}

    def latestOffset(self):
        # admission control lives HERE: whatever range the engine plans
        # from this offset it also commits, so clamping anywhere else
        # would silently drop messages. ≤ rate ids per trigger — the
        # batch-receive policy of a consumer draining a bounded backlog.
        self._current = min(self._current + self.rate, self.total)
        return {"id": self._current}

    def partitions(self, start, end):
        lo, hi = start["id"], end["id"]
        step = max(1, -(-(hi - lo) // self.n_parts)) if hi > lo else 1
        return [
            _RangePartition(a, min(a + step, hi)) for a in range(lo, hi, step)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _gen(partition.start, partition.end)

    def commit(self, end):
        pass


class PulsarSimDataSource(DataSource):
    @classmethod
    def name(cls):
        return "pulsar_sim"

    def schema(self):
        return SIM_SCHEMA

    def reader(self, schema):
        return PulsarSimBatchReader(self.options)

    def streamReader(self, schema):
        return PulsarSimStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PulsarSimDataSource)
