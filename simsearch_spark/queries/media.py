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


MEDIA_QUERIES = {
    "media_meta": (q_media_meta, SQL_MEDIA_META),
}
