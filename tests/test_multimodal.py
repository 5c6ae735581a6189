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


def test_real_audio_decoder_roundtrips_wav(spark):
    """The real-codec tier, exercised end-to-end: synthesize actual WAV
    payloads with stdlib wave, decode through the SAME mapInPandas
    plumbing as the fakes, and check the true frame counts come back."""
    import io
    import wave as wave_mod

    from mi_inbound_pulsar_spark.operators.multimodal import (
        decode_media,
        real_decoders,
    )

    def make_wav(n_frames: int) -> bytes:
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(b"\x00\x01" * n_frames)
        return buf.getvalue()

    rows = [(1, "audio", make_wav(100)), (2, "audio", make_wav(250))]
    df = spark.createDataFrame(rows, "media_id long, media_type string, payload binary")
    got = {
        r["media_id"]: r["n_frames"]
        for r in decode_media(df, decoders=real_decoders()).collect()
    }
    assert got == {1: 100, 2: 250}


def test_real_image_decoder_guards_missing_pil(spark):
    """Without Pillow the real image decoder must fail loudly (clear
    install hint), never return fake dimensions."""
    import pytest as _pytest

    from mi_inbound_pulsar_spark.operators.multimodal import _real_image_decode

    try:
        import PIL  # noqa: F401

        _pytest.skip("Pillow installed; guard path not reachable")
    except ImportError:
        pass
    with _pytest.raises(NotImplementedError, match="Pillow"):
        _real_image_decode(b"\x89PNG\r\n\x1a\n")
