"""Keyed streaming top-k as a custom stateful operator.

A leaderboard ("largest k values ever seen per key") cannot be a
windowed aggregate — its state is the top-k itself and must survive
micro-batch boundaries. ``applyInPandasWithState`` keyed by the group
carries exactly k (id, value) pairs per key: each batch merges its
rows into the incumbents, re-emits the current standings, and stores
the k survivors. Complements ``streaming/ewma.py`` (O(1) numeric
state) with the bounded-collection state shape.

Scale: state is k rows per key — bounded by construction; the shuffle
key is the group, so a billion-key stream spreads leaderboards across
the cluster, and the per-batch merge is O(batch + k) per key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOPK_SCHEMA = "event_type string, rank int, event_id bigint, value double"
TOPK_STATE_SCHEMA = "ids array<long>, vals array<double>"


def make_topk_fn(k: int = 3):
    """Build the stateful merge function (exposed for unit testing).
    Ordering: value desc, event_id asc (total, deterministic)."""

    def topk(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        pairs: list[tuple[float, int]] = []
        if state.exists:
            ids, vals = state.get
            pairs = [(float(v), int(i)) for i, v in zip(ids, vals)]
        for pdf in pdfs:
            pairs.extend(
                (float(v), int(i)) for i, v in zip(pdf["event_id"], pdf["value"])
            )
        pairs.sort(key=lambda p: (-p[0], p[1]))
        best = pairs[:k]
        state.update(([i for _, i in best], [v for v, _ in best]))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(best),
                "rank": list(range(1, len(best) + 1)),
                "event_id": [i for _, i in best],
                "value": [v for v, _ in best],
            }
        )

    return topk


def topk_stream(df: DataFrame, k: int = 3) -> DataFrame:
    """Streaming per-key leaderboard: input needs (event_type,
    event_id, value); emits the current top-k standings per key each
    micro-batch."""
    return df.groupBy("event_type").applyInPandasWithState(
        make_topk_fn(k),
        outputStructType=TOPK_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
