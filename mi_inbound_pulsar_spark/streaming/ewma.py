"""Keyed exponentially-weighted moving average as a custom stateful
streaming operator.

The reference's processing tier hands each record to a pipeline
callback in arrival order per key (Key_Shared ordering,
``PulsarMessageConsumer.java`` consumer loop); an EWMA over that
per-key stream is the canonical "running smoother" a metrics consumer
maintains. Spark-first that is ``applyInPandasWithState``: state is a
single double per key (the smoothed value), each micro-batch folds its
rows in event-time order and emits the per-event smoothed series.

The batch twin (``q_ewma_smoothing`` in ``operators/eventsops.py``)
expresses the same fold as an ordered-array ``aggregate`` HOF — exact
DuckDB parity via ``list_reduce`` — and is the backfill form; this
module is the incremental form whose state never exceeds one double
per key regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: per-event smoothed output
EWMA_SCHEMA = "user_id bigint, event_time timestamp, value double, ewma double"
#: state: the smoothed value so far
EWMA_STATE_SCHEMA = "ewma double"


def make_ewma_fn(alpha: float = 0.2):
    """Build the applyInPandasWithState function (exposed for unit
    testing). Seeds with the first observed value, then folds
    ``ewma = alpha·x + (1−alpha)·ewma`` in event-time order within
    each batch, carrying the accumulator across micro-batches."""

    def smooth(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        ewma = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values("event_time")
            out = []
            for v in pdf["value"]:
                v = float(v)
                ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
                out.append(ewma)
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"].astype("int64"),
                    "event_time": pdf["event_time"],
                    "value": pdf["value"].astype("float64"),
                    "ewma": out,
                }
            )
        state.update((ewma,))

    return smooth


def ewma_stream(df: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Streaming per-key EWMA: input needs (user_id, event_time, value).

    Scale: shuffle key is user_id, state is ONE double per key — the
    smallest possible stateful footprint; a 100 TB/day stream with a
    billion keys carries 8 GB of state across the cluster. Ordering
    inside a batch is by event time; cross-batch order is arrival
    order (watermark-governed sources deliver per-key in order under
    Key_Shared semantics, which the simulated source preserves).
    """
    return df.groupBy("user_id").applyInPandasWithState(
        make_ewma_fn(alpha),
        outputStructType=EWMA_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
