"""Declared query: multimodal binary-column plumbing, end to end.

The fixtures carry no media table, so payloads are synthesized
deterministically: each document becomes a minimal valid PNG whose IHDR
encodes (width = n_chars, height = doc_id % 480 + 1).  The query then runs
the real pipeline — binary column → Arrow batches → header sniff
(`multimodal.binary.decode_image_meta`) — and must recover exactly the
dimensions the oracle computes directly from the table.  This checks the
binary round-trip, the mapInPandas schema contract, and the PNG parser
against ground truth the parser never sees.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from simsearch_spark.multimodal.binary import decode_image_meta
from simsearch_spark.sources.registry import load_table

#: fixed PNG scaffold size: signature(8) + length(4) + 'IHDR'(4) + data(13) + crc(4)
PNG_BYTES = 33


def _png(width: int, height: int) -> bytes:
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": [
                        _png(int(c), int(d) % 480 + 1)
                        for c, d in zip(pdf["n_chars"], pdf["doc_id"])
                    ],
                    "mime": "image/png",
                }
            )

    media = docs.mapInPandas(
        synth, "media_id long, kind string, payload binary, mime string"
    )
    meta = decode_image_meta(media)
    return meta.select("media_id", "n_bytes", "width", "height", "format")


SQL_MEDIA_META = f"""
SELECT doc_id AS media_id, {PNG_BYTES} AS n_bytes,
       n_chars::INT AS width, (doc_id % 480 + 1)::INT AS height,
       'png' AS format
FROM documents
"""


# -----------------------------------------------------------------------------
# media_pixel_stats: REAL pixel decode end to end
# -----------------------------------------------------------------------------


def q_media_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode path (multimodal/png.py): each document becomes a real
    two-tone grayscale PNG — left half value ``doc_id % 256``, right half
    ``(doc_id*7 + 13) % 256``, width ``n_chars % 31 + 2``, height
    ``doc_id % 7 + 1`` — encoded with scanline filter ``doc_id % 5`` (so
    the declared pipeline exercises every PNG unfilter).  The engine must
    recover the exact per-image pixel mean the oracle computes in closed
    form from the synthesis parameters; the pixels themselves never exist
    outside the Arrow batch."""
    from simsearch_spark.multimodal.binary import pixel_stats
    from simsearch_spark.multimodal.png import encode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d, c in zip(pdf["doc_id"], pdf["n_chars"]):
                d, c = int(d), int(c)
                w, h = c % 31 + 2, d % 7 + 1
                a, b = d % 256, (d * 7 + 13) % 256
                row = bytes([a] * (w // 2) + [b] * (w - w // 2))
                payloads.append(encode_png(w, h, 1, row * h, filter_types=d % 5))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/png",
                }
            )

    media = docs.mapInPandas(
        synth, "media_id long, kind string, payload binary, mime string"
    )
    return pixel_stats(media).select(
        "media_id", "decoded", "width", "height", "channels", "mean_c0"
    )


SQL_MEDIA_PIXEL_STATS = """
SELECT doc_id AS media_id, 'ok' AS decoded,
       (n_chars % 31 + 2)::INT AS width, (doc_id % 7 + 1)::INT AS height,
       1 AS channels,
       round(((doc_id % 256) * ((n_chars % 31 + 2) // 2)
              + ((doc_id * 7 + 13) % 256)
                * ((n_chars % 31 + 2) - (n_chars % 31 + 2) // 2))::DOUBLE
             / (n_chars % 31 + 2), 6) AS mean_c0
FROM documents
"""


# -----------------------------------------------------------------------------
# media_audio_stats: REAL WAV decode end to end
# -----------------------------------------------------------------------------


def q_media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full audio decode path (multimodal/wav.py): each document becomes a
    real PCM-16 WAV square wave — amplitude ``(doc_id % 200 + 10)*100``,
    half-period ``doc_id % 5 + 1`` samples, ``n_chars % 8 + 2`` cycles,
    rate ``8000 + (doc_id % 4)*4000`` — and the engine must recover the
    closed-form duration, RMS (= amplitude exactly for a square wave), and
    zero-crossing count (2·cycles − 1).  Samples never exist outside the
    Arrow batch."""
    from simsearch_spark.multimodal.binary import audio_stats
    from simsearch_spark.multimodal.wav import encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d, c in zip(pdf["doc_id"], pdf["n_chars"]):
                d, c = int(d), int(c)
                amp = (d % 200 + 10) * 100
                half = d % 5 + 1
                cycles = c % 8 + 2
                rate = 8000 + (d % 4) * 4000
                wave = ([amp] * half + [-amp] * half) * cycles
                payloads.append(encode_wav(wave, rate))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "audio",
                    "payload": payloads,
                    "mime": "audio/wav",
                }
            )

    media = docs.mapInPandas(
        synth, "media_id long, kind string, payload binary, mime string"
    )
    return audio_stats(media)


SQL_MEDIA_AUDIO_STATS = """
SELECT doc_id AS media_id, 'ok' AS decoded,
       (8000 + (doc_id % 4) * 4000)::INT AS sample_rate, 1 AS channels,
       (2 * (doc_id % 5 + 1) * (n_chars % 8 + 2))::BIGINT AS n_samples,
       round((2 * (doc_id % 5 + 1) * (n_chars % 8 + 2))::DOUBLE
             / (8000 + (doc_id % 4) * 4000), 6) AS duration_s,
       ((doc_id % 200 + 10) * 100)::DOUBLE AS rms,
       (2 * (n_chars % 8 + 2) - 1)::BIGINT AS zero_crossings
FROM documents
"""


# -----------------------------------------------------------------------------
# media_frame_sample: REAL video container parsing end to end
# -----------------------------------------------------------------------------

FRAME_EVERY_N = 2


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full video container path (multimodal/avi.py): each document becomes
    a real AVI wrapping ``doc_id % 6 + 1`` frames of ``n_chars % 17 + 1``
    bytes each at 25 fps; the engine parses the container's frame index and
    samples every ``FRAME_EVERY_N``-th frame's ACTUAL bytes.  The oracle
    computes the identical sampled (frame_idx, frame size) fan-out in
    closed form — frame boundaries must land exactly for sizes to match."""
    from simsearch_spark.multimodal.avi import encode_avi_mjpeg
    from simsearch_spark.multimodal.binary import frame_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d, c in zip(pdf["doc_id"], pdf["n_chars"]):
                d, c = int(d), int(c)
                frames = [
                    bytes([(d + i) % 256]) * (c % 17 + 1) for i in range(d % 6 + 1)
                ]
                payloads.append(encode_avi_mjpeg(frames, fps=25))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "video",
                    "payload": payloads,
                    "mime": "video/avi",
                }
            )

    media = docs.mapInPandas(
        synth, "media_id long, kind string, payload binary, mime string"
    )
    from pyspark.sql import functions as F

    return frame_sample(media, every_n=FRAME_EVERY_N).select(
        "media_id",
        "decoded",
        "fps",
        "n_frames",
        "frame_idx",
        F.length("frame").cast("long").alias("frame_bytes"),
    )


SQL_MEDIA_FRAME_SAMPLE = f"""
SELECT doc_id AS media_id, 'ok' AS decoded, 25.0::DOUBLE AS fps,
       (doc_id % 6 + 1)::INT AS n_frames, u.i::INT AS frame_idx,
       (n_chars % 17 + 1)::BIGINT AS frame_bytes
FROM documents, unnest(range(0, doc_id % 6 + 1, {FRAME_EVERY_N})) AS u(i)
"""


# -----------------------------------------------------------------------------
# media_jpeg_stats: REAL JPEG entropy decode end to end
# -----------------------------------------------------------------------------


def q_media_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full JPEG decode path (multimodal/jpeg.py — Huffman entropy decode,
    dequantize, exact IDCT): each document becomes a real baseline JPEG,
    grayscale, 8px-block-aligned two-tone (left ``doc_id % 256``, right
    ``(doc_id*11 + 29) % 256``).  Every 8×8 block is constant, and at
    quality 85 the DC quantization step (≤5) bounds reconstruction error
    below 0.5 — so integer pixels decode EXACTLY and the oracle's
    closed-form mean must match to the last bit (the exactness property is
    unit-tested in tests/test_jpeg.py::test_grayscale_block_constant_is_exact)."""
    from simsearch_spark.multimodal.binary import pixel_stats
    from simsearch_spark.multimodal.jpeg import encode_jpeg

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d, c in zip(pdf["doc_id"], pdf["n_chars"]):
                d, c = int(d), int(c)
                w = 8 * (c % 4 + 2)
                half = 8 * ((c % 4 + 2) // 2)
                h = d % 9 + 4
                a, b = d % 256, (d * 11 + 29) % 256
                row = bytes([a] * half + [b] * (w - half))
                payloads.append(encode_jpeg(w, h, 1, row * h, quality=85))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/jpeg",
                }
            )

    media = docs.mapInPandas(
        synth, "media_id long, kind string, payload binary, mime string"
    )
    return pixel_stats(media).select(
        "media_id", "decoded", "width", "height", "channels", "mean_c0"
    )


SQL_MEDIA_JPEG_STATS = """
SELECT doc_id AS media_id, 'ok' AS decoded,
       (8 * (n_chars % 4 + 2))::INT AS width, (doc_id % 9 + 4)::INT AS height,
       1 AS channels,
       round(((doc_id % 256) * (8 * ((n_chars % 4 + 2) // 2))
              + ((doc_id * 11 + 29) % 256)
                * (8 * (n_chars % 4 + 2) - 8 * ((n_chars % 4 + 2) // 2)))::DOUBLE
             / (8 * (n_chars % 4 + 2)), 6) AS mean_c0
FROM documents
"""


# -----------------------------------------------------------------------------
# media_frame_pixel_stats: REAL video frame PIXEL decode end to end (r7 —
# container index + per-frame JPEG entropy decode; closes the MJPEG half of
# the r6 'frame pixel decode' seam)
# -----------------------------------------------------------------------------


def q_media_frame_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each document becomes a real MJPEG AVI of ``doc_id % 4 + 1`` frames;
    frame ``i`` is a UNIFORM ``(n_chars % 13 + 4)``×``(doc_id % 5 + 3)``
    grayscale baseline JPEG of value ``(doc_id*13 + i*37) % 256`` — uniform
    images are block-constant whatever the geometry, so q85 decodes the
    integer value exactly (tests/test_jpeg.py exactness property) and the
    sampled per-frame mean has a closed form.  The engine runs
    `frame_pixel_stats`: AVI frame index + per-frame entropy decode inside
    one Arrow batch — pixels and frame bytes never leave the task."""
    from simsearch_spark.multimodal.avi import encode_avi_mjpeg
    from simsearch_spark.multimodal.binary import frame_pixel_stats
    from simsearch_spark.multimodal.jpeg import encode_jpeg

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d, c in zip(pdf["doc_id"], pdf["n_chars"]):
                d, c = int(d), int(c)
                w, h = c % 13 + 4, d % 5 + 3
                frames = [
                    encode_jpeg(
                        w, h, 1, bytes([(d * 13 + i * 37) % 256]) * (w * h), quality=85
                    )
                    for i in range(d % 4 + 1)
                ]
                payloads.append(encode_avi_mjpeg(frames, fps=25))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "video",
                    "payload": payloads,
                    "mime": "video/avi",
                }
            )

    media = docs.mapInPandas(
        synth, "media_id long, kind string, payload binary, mime string"
    )
    return frame_pixel_stats(media, every_n=FRAME_EVERY_N)


SQL_MEDIA_FRAME_PIXEL_STATS = f"""
SELECT doc_id AS media_id, 'ok' AS decoded,
       (doc_id % 4 + 1)::INT AS n_frames, u.i::INT AS frame_idx,
       (n_chars % 13 + 4)::INT AS width, (doc_id % 5 + 3)::INT AS height,
       1 AS channels,
       ((doc_id * 13 + u.i * 37) % 256)::DOUBLE AS mean_c0
FROM documents, unnest(range(0, doc_id % 4 + 1, {FRAME_EVERY_N})) AS u(i)
"""


MEDIA_QUERIES = {
    "media_meta": (q_media_meta, SQL_MEDIA_META),
    "media_pixel_stats": (q_media_pixel_stats, SQL_MEDIA_PIXEL_STATS),
    "media_audio_stats": (q_media_audio_stats, SQL_MEDIA_AUDIO_STATS),
    "media_frame_sample": (q_media_frame_sample, SQL_MEDIA_FRAME_SAMPLE),
    "media_jpeg_stats": (q_media_jpeg_stats, SQL_MEDIA_JPEG_STATS),
    "media_frame_pixel_stats": (
        q_media_frame_pixel_stats,
        SQL_MEDIA_FRAME_PIXEL_STATS,
    ),
}
