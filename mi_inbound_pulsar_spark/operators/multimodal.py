"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` columns with typed metadata, decode/feature-extract as
Arrow-batched Pandas UDFs over ``mapInPandas``.

The codec step is pluggable per media type: ``decode_media`` takes a
decoder dict. Registered queries use the deterministic
``FAKE_DECODERS`` (clearly marked — oracle-reproducible arithmetic on
byte length), while ``real_decoders()`` wires actual codecs: PIL when
installed, else pure-stdlib format parsers (PNG/GIF/BMP/JPEG/PNM —
real header+structure decode, in-container tested) for images, and
stdlib ``wave`` for WAV audio (always available, exercised in
tests/test_multimodal.py with synthesized payloads of every
format). The Spark-side plumbing — binary schema,
mapInPandas batch shape, UDF signature, partition behavior — is
identical on both tiers; a production build swaps one dict.

Scale: mapInPandas streams Arrow batches; media blobs never pass
through Python row-at-a-time, and decode parallelism is partition
parallelism. Large blobs should set
``spark.sql.execution.arrow.maxRecordsPerBatch`` down so a batch of
decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.sources.tables import load_table

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "width int, height int, n_frames int, checksum string"
)


def _fake_image_decode(payload: bytes) -> dict:
    """FAKE decoder (no PIL in container): deterministic dims from the
    payload bytes. A real build replaces this with PIL.Image.open."""
    n = len(payload)
    return {"width": 64 + n % 512, "height": 64 + (n * 7) % 512, "n_frames": 1}


def _fake_audio_decode(payload: bytes) -> dict:
    """FAKE decoder (no librosa in container): frame count from length."""
    n = len(payload)
    return {"width": 0, "height": 0, "n_frames": 1 + n // 16}


FAKE_DECODERS: dict[str, Callable[[bytes], dict]] = {
    "image": _fake_image_decode,
    "audio": _fake_audio_decode,
}


def _parse_png(b: bytes) -> dict:
    """Real PNG parse (pure stdlib): signature + IHDR width/height with
    CRC verification (zlib.crc32), APNG ``acTL`` frame count."""
    import struct
    import zlib

    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    length, ctype = struct.unpack(">I4s", b[8:16])
    if ctype != b"IHDR" or length != 13:
        raise ValueError("PNG: first chunk is not IHDR")
    if (zlib.crc32(b[12:29]) & 0xFFFFFFFF) != struct.unpack(">I", b[29:33])[0]:
        raise ValueError("PNG: IHDR CRC mismatch")
    width, height = struct.unpack(">II", b[16:24])
    n_frames, off = 1, 33
    while off + 8 <= len(b):  # scan chunks up to first IDAT for APNG acTL
        ln, ct = struct.unpack(">I4s", b[off : off + 8])
        if ct == b"acTL":
            n_frames = struct.unpack(">I", b[off + 8 : off + 12])[0]
            break
        if ct in (b"IDAT", b"IEND"):
            break
        off += 12 + ln
    return {"width": int(width), "height": int(height), "n_frames": int(n_frames)}


def _parse_gif(b: bytes) -> dict:
    """Real GIF parse (pure stdlib): logical-screen descriptor plus a
    full block walk (extensions, local color tables, LZW sub-blocks)
    counting image descriptors — animated GIFs report true frames."""
    import struct

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", b[6:10])
    flags, off = b[10], 13
    if flags & 0x80:  # global color table
        off += 3 * (2 << (flags & 0x07))
    n_frames = 0
    while off < len(b):
        blk = b[off]
        if blk == 0x3B:  # trailer
            break
        if blk == 0x21:  # extension: label byte then sub-blocks
            off += 2
            while off < len(b) and b[off] != 0:
                off += 1 + b[off]
            off += 1
        elif blk == 0x2C:  # image descriptor
            n_frames += 1
            lflags = b[off + 9]
            off += 10
            if lflags & 0x80:  # local color table
                off += 3 * (2 << (lflags & 0x07))
            off += 1  # LZW minimum code size
            while off < len(b) and b[off] != 0:
                off += 1 + b[off]
            off += 1
        else:
            raise ValueError(f"GIF: unknown block 0x{blk:02x} at {off}")
    return {"width": int(width), "height": int(height), "n_frames": max(n_frames, 1)}


def _parse_bmp(b: bytes) -> dict:
    """Real BMP parse (pure stdlib): BITMAPINFOHEADER (or the ancient
    CORE header) dimensions; top-down negative heights normalized."""
    import struct

    if b[:2] != b"BM" or len(b) < 26:
        raise ValueError("not a BMP")
    hdr_size = struct.unpack("<I", b[14:18])[0]
    if hdr_size >= 40:
        width, height = struct.unpack("<ii", b[18:26])
    else:  # BITMAPCOREHEADER: u16 dims
        width, height = struct.unpack("<HH", b[18:22])
    return {"width": int(abs(width)), "height": int(abs(height)), "n_frames": 1}


def _parse_jpeg(b: bytes) -> dict:
    """Real JPEG parse (pure stdlib): marker-segment walk to the first
    SOFn frame header (baseline/progressive), big-endian dims."""
    import struct

    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    off = 2
    while off + 4 <= len(b):
        if b[off] != 0xFF:
            raise ValueError(f"JPEG: lost marker sync at {off}")
        marker = b[off + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
            off += 2
            continue
        seglen = struct.unpack(">H", b[off + 2 : off + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            height, width = struct.unpack(">HH", b[off + 5 : off + 9])
            return {"width": int(width), "height": int(height), "n_frames": 1}
        off += 2 + seglen
    raise ValueError("JPEG: no SOF marker found")


def _parse_pnm(b: bytes) -> dict:
    """Real PPM/PGM parse (pure stdlib): P5/P6 ASCII header with
    comment handling."""
    if b[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM")
    toks: list[int] = []
    i = 2
    while len(toks) < 2 and i < len(b):
        c = b[i : i + 1]
        if c == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(b) and not b[j : j + 1].isspace():
                j += 1
            toks.append(int(b[i:j]))
            i = j
    if len(toks) < 2:
        raise ValueError("PNM: truncated header")
    return {"width": toks[0], "height": toks[1], "n_frames": 1}


_IMAGE_PARSERS = (
    (b"\x89PNG\r\n\x1a\n", _parse_png),
    (b"GIF8", _parse_gif),
    (b"BM", _parse_bmp),
    (b"\xff\xd8", _parse_jpeg),
    (b"P5", _parse_pnm),
    (b"P6", _parse_pnm),
)


def stdlib_image_decode(payload: bytes) -> dict:
    """Real image codec, zero external dependencies: sniffs the magic
    bytes and runs an actual format parser (PNG incl. IHDR CRC check
    and APNG frame count, GIF block walk with true frame count, BMP,
    JPEG SOF marker walk, binary PNM). Exercised for real in
    tests/test_multimodal.py on synthesized payloads of every format —
    this tier is NOT a fake."""
    for magic, parser in _IMAGE_PARSERS:
        if payload[: len(magic)] == magic:
            return parser(payload)
    raise NotImplementedError(
        "unrecognized image format (supported without PIL: PNG, GIF, BMP, "
        "JPEG, PNM; install Pillow for the full format surface)"
    )


def _real_image_decode(payload: bytes) -> dict:
    """Real image codec: PIL when installed (full format surface),
    otherwise the pure-stdlib parsers in :func:`stdlib_image_decode` —
    so the real tier works, and is tested, even in this container."""
    try:
        from PIL import Image  # optional dependency
    except ImportError:
        return stdlib_image_decode(payload)
    import io

    with Image.open(io.BytesIO(payload)) as img:
        return {
            "width": int(img.width),
            "height": int(img.height),
            "n_frames": int(getattr(img, "n_frames", 1)),
        }


def _real_audio_decode(payload: bytes) -> dict:
    """Real audio codec for WAV via stdlib ``wave`` — no external
    dependency, so this tier is genuinely exercised in tests (a
    synthesized in-memory WAV round-trips through the same
    mapInPandas plumbing as the fakes)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        return {"width": 0, "height": 0, "n_frames": int(w.getnframes())}


def real_decoders() -> dict[str, Callable[[bytes], dict]]:
    """The production decoder dict: real codecs where the library
    exists, import-guarded errors where it doesn't."""
    return {"image": _real_image_decode, "audio": _real_audio_decode}


def decode_media(
    df: DataFrame, decoders: dict[str, Callable[[bytes], dict]] | None = None
) -> DataFrame:
    """Decode a (media_id, media_type, payload) frame into metadata via
    ``mapInPandas`` — the real multimodal plumbing (Arrow batches
    in/out). ``decoders`` maps media_type -> codec; defaults to the
    deterministic ``FAKE_DECODERS`` tier (oracle-reproducible), pass
    ``real_decoders()`` for actual codecs."""
    chosen = FAKE_DECODERS if decoders is None else decoders

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            metas = []
            for mtype, payload in zip(pdf["media_type"], pdf["payload"]):
                decoder = chosen.get(mtype)
                if decoder is None:
                    raise NotImplementedError(f"no decoder for media type {mtype!r}")
                meta = decoder(bytes(payload))
                meta["checksum"] = hashlib.md5(bytes(payload)).hexdigest()
                metas.append(meta)
            meta_df = pd.DataFrame(metas)
            yield pd.concat([pdf.reset_index(drop=True), meta_df], axis=1)

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media frame from documents: the utf-8 text bytes act
    as the opaque payload (deterministic, oracle-reproducible)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def sample_frames(decoded: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: one output row per every_n-th frame of each media
    item — the 1→k row expansion a video/audio pipeline needs. Runs as
    ``mapInPandas`` so a real decoder could attach the frame payload;
    the expansion happens inside the Arrow batch (no shuffle, no
    Python-row overhead).

    STUB NOTE: with no media libs in the container the frame payload is
    the item checksum + index (deterministic); the batch-shape change,
    schema, and partition behavior are the real deliverable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_ref = [], [], []
            for mid, n_frames, checksum in zip(pdf["media_id"], pdf["n_frames"], pdf["checksum"]):
                for idx in range(0, int(n_frames), every_n):
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_ref.append(f"{checksum}:{idx}")
            yield pd.DataFrame(
                {"media_id": out_id, "frame_index": out_idx, "frame_ref": out_ref}
            ).astype({"media_id": "int64", "frame_index": "int32"})

    return decoded.mapInPandas(run, schema="media_id long, frame_index int, frame_ref string")


@query(
    "q_multimodal_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN 1
                  ELSE 1 + octet_length(encode(text)) // 16 END AS n_frames,
             md5(text) AS checksum
      FROM documents
    )
    SELECT media_id, CAST((i - 1) * 4 AS INTEGER) AS frame_index,
           checksum || ':' || CAST((i - 1) * 4 AS VARCHAR) AS frame_ref
    FROM meta, unnest(generate_series(1, CAST(ceil(n_frames / 4.0) AS BIGINT))) AS u(i)
    ORDER BY media_id, frame_index
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → sample every 4th frame: the full multimodal pipeline
    (binary payload → metadata → per-frame rows), oracle-replayed via
    the deterministic fake codec arithmetic."""
    decoded = decode_media(media_frame(spark, sf_dir))
    return sample_frames(decoded, every_n=4).orderBy("media_id", "frame_index")


@query(
    "q_multimodal_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
           octet_length(encode(text)) AS n_bytes,
           CASE WHEN doc_id % 2 = 0 THEN 64 + octet_length(encode(text)) % 512 ELSE 0 END AS width,
           CASE WHEN doc_id % 2 = 0 THEN 64 + (octet_length(encode(text)) * 7) % 512 ELSE 0 END AS height,
           CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1 + octet_length(encode(text)) // 16 END AS n_frames,
           md5(text) AS checksum
    FROM documents ORDER BY media_id
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: documents→payload→mapInPandas
    decode→metadata. The fake decoder is arithmetic on byte length, so
    the oracle replays it in SQL — what is being verified is the
    Arrow/mapInPandas plumbing, schema, and checksum path."""
    decoded = decode_media(media_frame(spark, sf_dir))
    return (
        decoded.select(
            "media_id",
            "media_type",
            F.octet_length("payload").alias("n_bytes"),
            "width",
            "height",
            "n_frames",
            "checksum",
        )
        .orderBy("media_id")
    )


@query(
    "q_multimodal_retrieval",
    oracle="""
    WITH q AS (
      SELECT doc_id + 1000000 AS query_id,
             list_transform(range(0, 64),
                            d -> sin((1.0 + doc_id*64 + d) * (1.0 + doc_id*64 + d))) AS q_emb
      FROM documents WHERE doc_id < 5
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    ranked AS (
      SELECT query_id, vec_id AS neighbor_id,
             list_cosine_similarity(q_emb, emb) AS sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY list_cosine_similarity(q_emb, emb) DESC, vec_id) AS rank
      FROM q CROSS JOIN e
    )
    SELECT query_id, neighbor_id, rank, round(sim, 6) AS sim
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def q_multimodal_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval composition: media item → embedding →
    cosine top-5 against the embeddings corpus.

    The embed step is the STUB (no vision model in the container): a
    deterministic sin(n²) vector seeded by the media id, which is what
    lets DuckDB rebuild the identical query vectors. The composition —
    decode metadata, derive a query embedding per item, run the
    broadcast-GEMM top-k against a corpus that never shuffles — is the
    real retrieval pipeline; swapping a CLIP-style encoder in changes
    only the embed function. Query ids are offset by 1e6 so the
    scorer's self-match exclusion can't collide with corpus vec_ids.
    """
    import numpy as np

    from mi_inbound_pulsar_spark.operators.similarity import brute_force_topk

    media = decode_media(media_frame(spark, sf_dir)).filter(F.col("media_id") < 5)
    ids = [int(r.media_id) for r in media.select("media_id").collect()]
    n = np.array(
        [[1.0 + m * 64 + d for d in range(64)] for m in sorted(ids)], dtype=np.float64
    )
    q_emb = np.sin(n * n)
    queries = media.sparkSession.createDataFrame(
        [
            (m + 1_000_000, [float(x) for x in q_emb[i]])
            for i, m in enumerate(sorted(ids))
        ],
        # double, not float: the oracle computes sin() in float64, and a
        # float32 round-trip moves cosines at the 6th decimal
        "vec_id long, embedding array<double>",
    )
    corpus = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(corpus, queries, k=5).orderBy("query_id", "rank")


@query(
    "q_multimodal_dedup",
    oracle="""
    WITH meta AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS checksum
      FROM documents
    )
    SELECT checksum, media_type,
           CAST(min(media_id) AS BIGINT) AS keeper_media_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(sum(n_bytes) - min(n_bytes) AS BIGINT) AS bytes_reclaimable
    FROM meta
    GROUP BY checksum, media_type
    ORDER BY keeper_media_id
    """,
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media dedup by content checksum: identical payloads collapse to
    one stored object (keep the lowest id), with reclaimable-bytes
    accounting — the storage-side dedup every blob/media lake runs, and
    the multimodal twin of ``q_dedup_exact``.

    Plan: the checksum comes out of the decode pass (mapInPandas), so
    the groupBy shuffles (checksum, type, id, n_bytes) — never the
    payload bytes. At 100 TB the payload column is pruned before the
    exchange; only fixed-width metadata crosses the wire.
    """
    decoded = decode_media(media_frame(spark, sf_dir)).withColumn(
        "n_bytes", F.length("payload").cast("long")
    )
    return (
        decoded.groupBy("checksum", "media_type")
        .agg(
            F.min("media_id").alias("keeper_media_id"),
            F.count(F.lit(1)).alias("n_copies"),
            (F.sum("n_bytes") - F.min("n_bytes")).alias("bytes_reclaimable"),
        )
        .orderBy("keeper_media_id")
    )
