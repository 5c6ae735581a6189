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


# ---------------------------------------------------------------------------
# Real image codecs: synthesized payloads of every stdlib-supported format
# ---------------------------------------------------------------------------
def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_png(w: int, h: int, apng_frames: int | None = None) -> bytes:
    """A real, spec-valid PNG: IHDR (8-bit RGB) + zlib IDAT + IEND,
    optionally an APNG acTL frame-count chunk."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(3 * w) for _ in range(h))
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if apng_frames is not None:
        out += _png_chunk(b"acTL", struct.pack(">II", apng_frames, 0))
    return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


def make_gif(w: int, h: int, frames: int = 1) -> bytes:
    """A real GIF89a: logical screen descriptor, per-frame graphic
    control extension + image descriptor + LZW sub-blocks, trailer."""
    import struct

    out = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x00, 0, 0])
    for _ in range(frames):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: size-4 block + term
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += b"\x02" + bytes([1, 0x44]) + b"\x00"  # LZW min size, 1 sub-block
    return out + b"\x3b"


def make_bmp(w: int, h: int) -> bytes:
    import struct

    row = ((3 * w + 3) // 4) * 4
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + row * h, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0)
        + bytes(row * h)
    )


def make_jpeg(w: int, h: int) -> bytes:
    import struct

    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    return (
        b"\xff\xd8"
        + b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xc0"
        + struct.pack(">H", 2 + len(sof))
        + sof
        + b"\xff\xd9"
    )


def make_ppm(w: int, h: int) -> bytes:
    return b"P6\n# synthesized\n%d %d\n255\n" % (w, h) + bytes(3 * w * h)


def test_stdlib_image_codecs_parse_real_formats():
    """The real image tier without PIL: every stdlib parser decodes an
    actual spec-valid payload of its format, including APNG/GIF frame
    counts — these are real codecs, not length arithmetic."""
    from mi_inbound_pulsar_spark.operators.multimodal import stdlib_image_decode

    assert stdlib_image_decode(make_png(640, 480)) == {
        "width": 640, "height": 480, "n_frames": 1,
    }
    assert stdlib_image_decode(make_png(16, 9, apng_frames=5))["n_frames"] == 5
    assert stdlib_image_decode(make_gif(320, 200, frames=3)) == {
        "width": 320, "height": 200, "n_frames": 3,
    }
    assert stdlib_image_decode(make_bmp(123, 77)) == {
        "width": 123, "height": 77, "n_frames": 1,
    }
    assert stdlib_image_decode(make_jpeg(1920, 1080)) == {
        "width": 1920, "height": 1080, "n_frames": 1,
    }
    assert stdlib_image_decode(make_ppm(12, 7)) == {
        "width": 12, "height": 7, "n_frames": 1,
    }


def test_stdlib_image_codecs_fail_loudly():
    """Unknown formats and corrupt payloads must error, never return
    fake dimensions: that is the honesty contract of the real tier."""
    from mi_inbound_pulsar_spark.operators.multimodal import stdlib_image_decode

    with pytest.raises(NotImplementedError, match="Pillow"):
        stdlib_image_decode(b"\x00\x01\x02not an image")
    corrupt = bytearray(make_png(8, 8))
    corrupt[18] ^= 0xFF  # flip a width byte; IHDR CRC no longer matches
    with pytest.raises(ValueError, match="CRC"):
        stdlib_image_decode(bytes(corrupt))


def test_real_image_decoder_through_spark_plumbing(spark):
    """Real codecs end-to-end through the SAME mapInPandas plumbing as
    the fakes: mixed-format binary payloads in one DataFrame, true
    dimensions out."""
    from mi_inbound_pulsar_spark.operators.multimodal import (
        decode_media,
        real_decoders,
    )

    rows = [
        (1, "image", make_png(640, 480)),
        (2, "image", make_gif(320, 200, frames=4)),
        (3, "image", make_bmp(64, 32)),
        (4, "image", make_jpeg(800, 600)),
    ]
    df = spark.createDataFrame(rows, "media_id long, media_type string, payload binary")
    got = {
        r["media_id"]: (r["width"], r["height"], r["n_frames"])
        for r in decode_media(df, decoders=real_decoders()).collect()
    }
    assert got == {
        1: (640, 480, 1),
        2: (320, 200, 4),
        3: (64, 32, 1),
        4: (800, 600, 1),
    }


def test_real_image_decoder_pil_branch():
    """When Pillow IS installed the real decoder prefers it; the
    stdlib parsers and PIL must agree on a spec-valid PNG."""
    pytest.importorskip("PIL")
    from mi_inbound_pulsar_spark.operators.multimodal import _real_image_decode

    assert _real_image_decode(make_png(31, 17)) == {
        "width": 31, "height": 17, "n_frames": 1,
    }
