"""Sinks (SURVEY.md §2B sinks row): parquet table sink (partitioned),
DLQ sink, console/memory for debugging — the engine side of the
reference's K1 dispatch + K7 DLQ routing.

Scale: `partition_by` controls file layout for downstream partition
pruning; writers are executor-parallel (one file per task per
partition key); nothing funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mi_inbound_pulsar_spark.config import DeadLetterPolicy
from mi_inbound_pulsar_spark.streaming.delivery import dlq_split


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Batch parquet sink; ``partition_by`` yields a pruned layout."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_stream_parquet(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    query_name: str = "parquet-sink",
):
    """Streaming parquet sink with checkpointed exactly-once file commits."""
    writer = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer.start()


def route_to_dlq(
    df: DataFrame, policy: DeadLetterPolicy, main_path: str, dlq_path: str
) -> tuple[int, int]:
    """K7 — split and persist both routes; returns (main, dlq) counts.
    The DLQ "topic" is a parquet table named by ``policy.dlq_topic`` at
    ``dlq_path`` (a broker publish when a real connector is attached)."""
    main, dlq = dlq_split(df, policy)
    write_parquet(main, main_path)
    write_parquet(dlq, dlq_path)
    # counts re-read from the sink: what was committed, not what was planned
    spark = df.sparkSession
    return spark.read.parquet(main_path).count(), spark.read.parquet(dlq_path).count()
