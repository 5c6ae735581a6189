"""Multimodal plumbing tests: decode metadata via mapInPandas and the
1→k frame-sampling row expansion (stub codecs, real Arrow plumbing)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators.multimodal import (
    decode_media,
    media_frame,
    sample_frames,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def decoded(spark):
    return decode_media(media_frame(spark, SF_DIR)).cache()


def test_decode_schema_and_checksum(decoded):
    assert decoded.columns == [
        "media_id", "media_type", "payload", "width", "height", "n_frames", "checksum",
    ]
    row = decoded.orderBy("media_id").first()
    import hashlib

    assert row.checksum == hashlib.md5(bytes(row.payload)).hexdigest()
    assert row.n_frames >= 1


def test_sample_frames_expansion(decoded):
    sampled = sample_frames(decoded, every_n=4)
    # Every media item yields ceil(n_frames / 4) rows, indices 0,4,8,...
    per_item = (
        sampled.groupBy("media_id")
        .agg(F.count("*").alias("k"), F.max("frame_index").alias("max_idx"))
    )
    joined = decoded.select("media_id", "n_frames").join(per_item, "media_id").collect()
    assert joined, "no media rows"
    for r in joined:
        expected = -(-r.n_frames // 4)  # ceil
        assert r.k == expected, (r.media_id, r.n_frames, r.k)
        assert r.max_idx == (expected - 1) * 4
    # frame_ref ties back to the checksum so a real decoder can fetch bytes
    one = sampled.filter(F.col("frame_index") == 0).first()
    assert one.frame_ref.endswith(":0")


def test_sample_frames_no_shuffle(decoded):
    plan = sample_frames(decoded, every_n=4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
