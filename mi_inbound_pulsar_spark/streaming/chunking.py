"""S15 — chunked-message reassembly.

The reference configures the Pulsar client to reassemble producer-split
messages (PulsarMessageConsumer.java:326-336: ``maxPendingChunkedMessage``,
``expiryTimeOfIncompleteChunkedMessageMillis``, auto-ack-oldest on queue
full) — the client does the work. Re-expressed Spark-first, reassembly
is a keyed stateful operator:

- **Streaming** (`reassemble_stream`): ``applyInPandasWithState`` keyed
  by ``chunk_uuid``. State = fragments seen so far + first-seen batch
  time. A group emits exactly when all ``total_chunks`` fragments are
  present; state older than the expiry is dropped (the reference's
  incomplete-chunk expiry), surfacing nothing — poison/partial uploads
  must not grow state forever at 100 TB.
- **Batch** (`reassemble_batch`): the same semantics as one
  groupBy+collect pass — oracle-checkable, and the correct backfill
  form (state is pointless when the whole input is present).

Scale: state per in-flight message is O(fragments); the shuffle key is
the chunk uuid so reassembly parallelizes per message; expiry bounds
state size exactly like ``expiryTimeOfIncompleteChunkedMessageMillis``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema of reassembly
ASSEMBLED_SCHEMA = "chunk_uuid string, n_chunks int, payload string"
#: state: fragment indexes + fragments seen so far
STATE_SCHEMA = "indexes array<int>, fragments array<string>, total int"


def reassemble_batch(chunks: DataFrame) -> DataFrame:
    """Batch reassembly: order fragments per uuid, emit complete payloads.

    Input columns: chunk_uuid, chunk_index (0-based), total_chunks,
    fragment. Incomplete groups (missing fragments) are dropped —
    mirroring the client's expiry of incomplete chunked messages.
    """
    return (
        chunks.groupBy("chunk_uuid")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_chunks"),
            F.first("total_chunks").alias("total_chunks"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("chunk_index").alias("i"), F.col("fragment").alias("f")))
                    ),
                    lambda s: s.getField("f"),
                ),
                "",
            ).alias("payload"),
        )
        .filter(F.col("n_chunks") == F.col("total_chunks"))
        .select("chunk_uuid", "n_chunks", "payload")
    )


def make_reassembler(expiry_ms: int | None = None):
    """Build the applyInPandasWithState function (exposed for direct
    unit testing with a fake GroupState)."""

    def reassemble(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # expiry of an incomplete chunked message — drop state
            # (≙ expiryTimeOfIncompleteChunkedMessageMillis)
            state.remove()
            return
        indexes: list[int] = []
        fragments: list[str] = []
        total = -1
        if state.exists:
            indexes, fragments, total = state.get
            indexes, fragments = list(indexes), list(fragments)
        for pdf in pdfs:
            for idx, tot, frag in zip(pdf["chunk_index"], pdf["total_chunks"], pdf["fragment"]):
                if int(idx) not in indexes:  # idempotent under replay
                    indexes.append(int(idx))
                    fragments.append(str(frag))
                total = int(tot)
        if total > 0 and len(indexes) == total:
            payload = "".join(f for _, f in sorted(zip(indexes, fragments)))
            state.remove()
            yield pd.DataFrame(
                {"chunk_uuid": [key[0]], "n_chunks": [total], "payload": [payload]}
            )
        else:
            state.update((indexes, fragments, total))
            if expiry_ms is not None:
                state.setTimeoutDuration(expiry_ms)

    return reassemble


def reassemble_stream(chunks: DataFrame, expiry_ms: int | None = None) -> DataFrame:
    """Streaming reassembly via applyInPandasWithState keyed by uuid."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if expiry_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return chunks.groupBy("chunk_uuid").applyInPandasWithState(
        make_reassembler(expiry_ms),
        outputStructType=ASSEMBLED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
