"""Parquet table catalog over the driver-generated testdata.

Scans are plain ``spark.read.parquet`` so Catalyst gets predicate
pushdown, column pruning, and partition pruning for free. At 100 TB the
same code path works against a partitioned parquet/lakehouse layout —
nothing here assumes single-file tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at *any* scale factor: at TPC-H
# proportions region=5 rows and nation=25 rows stay constant, and
# supplier grows slowly. Broadcasting these removes a shuffle per join.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        return _normalize_timestamps(_load_events(spark, sf_dir))
    return _normalize_timestamps(
        spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    )


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Parquet written with tz-naive timestamps (isAdjustedToUTC=false)
    surfaces as TIMESTAMP_NTZ under Spark 4's default
    ``inferTimestampNTZ``; functions like ``unix_micros`` reject NTZ.
    The whole engine (and its DuckDB oracles) treats timestamps as
    instants, so cast NTZ → TIMESTAMP once at the scan. The session tz
    is UTC (asserted by the session builder), making the cast
    instant-preserving; it stays a cheap codegen'd projection that does
    not block pushdown of comparisons on the same column."""
    from pyspark.sql import functions as F

    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz_cols:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. Read nanos as long (session conf) and convert to a
    microsecond timestamp — the same truncation DuckDB applies when
    casting timestamp_ns → timestamp, so oracles stay aligned."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API) and return them."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
