"""Layout maintenance tests: compaction file counts + data equality,
and Z-order clustering quality measured from parquet footer stats."""

from __future__ import annotations

import glob
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.plans.layout import compact_small_files, zorder_write
from mi_inbound_pulsar_spark.sources.tables import load_table


def _parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(f"{path}/part-*.parquet"))


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    src = tempfile.mkdtemp(prefix="layout_small_")
    dst = tempfile.mkdtemp(prefix="layout_compact_")
    # simulate streaming ingest: many tiny files
    e.repartition(40).write.mode("overwrite").parquet(src)
    assert len(_parquet_files(src)) == 40
    n_rows = e.count()
    n_files = compact_small_files(spark, src, dst, target_rows_per_file=n_rows // 2 + 1)
    assert n_files == 2
    assert len(_parquet_files(dst)) == 2
    out = spark.read.parquet(dst)
    assert out.count() == n_rows
    assert out.agg(F.sum("event_id")).first()[0] == e.agg(F.sum("event_id")).first()[0]


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    ranges = []
    for f in _parquet_files(path):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            ranges.append((min(los), max(his)))
    return ranges


def test_zorder_tightens_minmax_envelopes_on_both_columns(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    plain = tempfile.mkdtemp(prefix="layout_plain_")
    zord = tempfile.mkdtemp(prefix="layout_zorder_")
    n_files = 8
    # baseline: round-robin (each file spans ~the full domain of every col)
    e.repartition(n_files).write.mode("overwrite").parquet(plain)
    zorder_write(e, zord, ["event_id", "user_id"], n_files=n_files)

    out = spark.read.parquet(zord)
    assert out.count() == e.count()
    assert set(out.columns) == {"event_id", "user_id", "value"}

    for col in ("event_id", "user_id"):
        glo = e.agg(F.min(col), F.max(col)).first()
        domain = glo[1] - glo[0]
        plain_spans = [hi - lo for lo, hi in _file_ranges(plain, col)]
        z_spans = [hi - lo for lo, hi in _file_ranges(zord, col)]
        assert plain_spans and z_spans
        # round-robin files each cover ~the whole domain; z-ordered
        # files must be materially tighter on BOTH interleaved columns
        assert sum(plain_spans) / len(plain_spans) > 0.9 * domain
        assert sum(z_spans) / len(z_spans) < 0.6 * domain
