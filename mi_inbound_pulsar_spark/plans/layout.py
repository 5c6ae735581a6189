"""Data-layout maintenance: small-file compaction and Z-order
clustered writes — the storage-side half of the 100 TB story.

Scan cost at scale is decided before any query runs, by how the data
lies on disk:

- **Small files**: a streaming ingest (the reference's micro-batch
  loop) emits one file per trigger per partition; a day of 100 ms
  triggers is millions of Kb-sized files and the scan dies on open()
  overhead and scheduler pressure. Compaction rewrites a partition to
  ~target-sized files — an idempotent, pure-Spark maintenance pass.
- **Z-order**: multi-dimensional min/max clustering. Sorting by one
  key gives perfect pruning on that key and none on others;
  interleaving the bits of several keys gives each file a narrow
  min/max envelope on EVERY participating column, so parquet
  row-group/file statistics prune scans with predicates on any of
  them. This is the same technique Delta/Iceberg expose as OPTIMIZE
  ZORDER BY, built here from plain expressions: rank-normalize each
  key to ``bits`` levels, interleave the bits JVM-side, then
  repartitionByRange + sortWithinPartitions on the z-value.

Both are asserted in tests/test_layout.py from parquet footer
statistics (pyarrow), not by trusting the writer.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Rewrite a parquet directory into ⌈rows / target⌉ evenly sized
    files; returns the file count. Write lands in ``dst_path`` (swap
    or catalog repoint is the caller's transaction — on object stores
    this is the copy-then-repoint pattern, never in-place mutation).

    Scale: one narrow read + one round-robin repartition; no data
    interpretation, so it applies to any schema. Run it per ingest
    partition (e.g. per hour) so the unit of work stays bounded.
    """
    df = spark.read.parquet(src_path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def with_zvalue(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Add an interleaved-bit ``zvalue`` column over integer columns.

    Each column is min/max rank-normalized into ``bits`` levels (the
    min/max pair comes from one tiny aggregate, broadcast back), then
    bit j of every column lands at position ``j * len(cols) + i`` —
    plain shift/or expressions, fully codegen'd, no UDF.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    stats = df.agg(*aggs)
    out = df.join(F.broadcast(stats))
    levels = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = F.col(f"_min_{c}").cast("double"), F.col(f"_max_{c}").cast("double")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        scaled.append(
            F.least(
                F.lit(levels),
                F.floor((F.col(c).cast("double") - lo) / span * levels).cast("long"),
            )
        )
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * len(cols) + i))
    return out.select(*df.columns, z.alias("zvalue"))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Write ``df`` clustered by the Z-curve over ``cols``: range-
    partition on zvalue (contiguous curve segments per file) and sort
    within each file so row groups inherit tight min/max envelopes on
    every participating column."""
    zdf = with_zvalue(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
