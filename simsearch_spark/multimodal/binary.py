"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image_meta`` parses only container headers (PNG/JPEG dimensions from
the first bytes — real, dependency-free), while ``extract_features`` ships a
deterministic fake behind `_HAS_DECODER`.  The Spark-side contract — schema,
batch iteration, partition sizing — is real and tested; swapping the fake for
PIL/torchvision changes one function body, not the plan.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row counts) governs partition
sizing; mapInPandas streams Arrow record batches, keeping peak executor
memory at batch granularity.  Feature extraction is shuffle-free; downstream
ANN over the produced embedding column reuses operators/ann.py.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: flipped to True when a real decoder library is wired in
_HAS_DECODER = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _sniff_header(payload: bytes) -> tuple[str, int, int]:
    """Dependency-free container sniffing: PNG IHDR / JPEG SOF0 / fallback.
    Real header parsing — not a stub — so metadata extraction works today."""
    if payload is None or len(payload) < 8:
        return ("unknown", -1, -1)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", int(w), int(h))
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return ("jpeg", int(w), int(h))
            i += 2 + seg_len
        return ("jpeg", -1, -1)
    return ("unknown", -1, -1)


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Extract typed metadata from binary payloads via mapInPandas (Arrow
    batches; pure-Python header sniff, no decode)."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmt_w_h = [_sniff_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [w for _f, w, _h in fmt_w_h],
                    "height": [h for _f, _w, h in fmt_w_h],
                    "format": [f for f, _w, _h in fmt_w_h],
                }
            )

    return df.mapInPandas(proc, META_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads.

    With a real decoder this would decode + run a vision/audio model per
    Arrow batch.  Without one (`_HAS_DECODER` False) it emits a deterministic
    byte-histogram sketch — a *fake*, clearly marked, but with the exact
    production schema/batching so the pipeline (dedup by embedding, ANN) runs
    end-to-end."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAS_DECODER:  # pragma: no cover
                raise NotImplementedError("wire a real decoder here (PIL/torchaudio)")
            embs = []
            for p in pdf["payload"]:
                if p is None:
                    embs.append([0.0] * FEATURE_DIM)
                    continue
                hist = [0] * FEATURE_DIM
                for b in p:
                    hist[b % FEATURE_DIM] += 1
                total = max(sum(hist), 1)
                embs.append([round(c / total, 6) for c in hist])
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": embs})

    return df.mapInPandas(proc, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("dst_width", IntegerType()),
        StructField("dst_height", IntegerType()),
        StructField("resized", StringType()),
    ]
)


def resize_images(df: DataFrame, max_w: int = 512, max_h: int = 512) -> DataFrame:
    """Aspect-preserving bounded resize over binary image payloads.

    The TARGET-geometry computation is real (min-scale fit into
    ``max_w × max_h``, never upscales, parsed from the actual container
    header); the pixel re-encode is the stubbed decode seam: with
    `_HAS_DECODER` a real decoder re-encodes, without one the payload
    passes through unchanged and ``resized`` records why
    (``'pass-through'`` when already within bounds, ``'stub'`` when a real
    decoder would have resized, ``'unknown'`` when the header is not
    parseable).  Schema, Arrow batching, and the per-row geometry contract
    are production-shaped; swapping in PIL changes only the marked branch.
    """

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "payload", "src_width", "src_height",
                                   "dst_width", "dst_height", "resized")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                fmt, w, h = _sniff_header(p)
                if w <= 0 or h <= 0:
                    dw, dh, tag = -1, -1, "unknown"
                elif w <= max_w and h <= max_h:
                    dw, dh, tag = w, h, "pass-through"
                else:
                    scale = min(max_w / w, max_h / h)
                    dw, dh = max(int(w * scale), 1), max(int(h * scale), 1)
                    if _HAS_DECODER:  # pragma: no cover
                        raise NotImplementedError("wire a real decoder here (PIL)")
                    tag = "stub"
                out["media_id"].append(mid)
                out["payload"].append(p)
                out["src_width"].append(w)
                out["src_height"].append(h)
                out["dst_width"].append(dw)
                out["dst_height"].append(dh)
                out["resized"].append(tag)
            yield pd.DataFrame(out)

    return df.mapInPandas(proc, RESIZE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: explodes (media_id, frame_idx) pairs for
    downstream decode.  Frame count is stubbed from payload size; the
    explode/partition shape is the real contract."""
    est_frames = F.greatest((F.length("payload") / F.lit(1024)).cast("int"), F.lit(1))
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), est_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
