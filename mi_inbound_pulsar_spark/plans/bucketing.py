"""Bucketed-table co-located joins (the no-shuffle fact-to-fact path).

At 100 TB the one join that cannot broadcast is fact-to-fact
(lineitem ⋈ orders). Bucketing both sides by the join key at write
time pre-shuffles the data ONCE; every subsequent join on that key is
a zero-exchange sort-merge join — Spark's FileScan reports the bucket
spec and Catalyst drops both Exchanges. That turns an O(data) shuffle
per query into an O(data) cost paid once at ingest.

Rules that make it work (asserted in tests/test_scale_patterns.py):
- identical bucket count on both sides (or a divisor, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``),
- join key == bucket key,
- ``sortBy`` on the bucket key lets the SMJ skip the per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 32,
    sorted_too: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_key)
    if sorted_too:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.

    With matching bucket specs the physical plan is a SortMergeJoin
    with NO Exchange on either side — the co-located join."""
    return spark.table(left_table).join(spark.table(right_table), key)
