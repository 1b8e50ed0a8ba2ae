"""Tests for the BMP codec (multimodal/bmp.py): round-trips over both bit
depths, palette handling, named seams, dispatch, and query routing."""

import random
import struct

import pytest

from simsearch_spark.multimodal.bmp import decode_bmp, encode_bmp, parse_bmp_header


def test_roundtrips_both_depths_and_strides():
    rng = random.Random(4)
    for w, h in [(1, 1), (5, 3), (31, 7), (64, 64), (33, 2), (4, 9)]:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        b = encode_bmp(w, h, 1, px)
        assert parse_bmp_header(b) == (w, h)
        assert decode_bmp(b) == (w, h, 1, px), (w, h)
        px3 = bytes(rng.randrange(256) for _ in range(3 * w * h))
        assert decode_bmp(encode_bmp(w, h, 3, px3)) == (w, h, 3, px3), (w, h)


def test_nongray_palette_expands_to_rgb():
    b = bytearray(encode_bmp(2, 1, 1, bytes([0, 1])))
    # palette entry 0 (BGRX at offset 54): make it blue-ish → not gray
    b[54:58] = bytes((200, 10, 30, 0))
    w, h, ch, px = decode_bmp(bytes(b))
    assert (w, h, ch) == (2, 1, 3)
    assert px[:3] == bytes((30, 10, 200))  # stored BGR → returned RGB
    assert px[3:6] == bytes((1, 1, 1))


def test_named_seams():
    g = encode_bmp(4, 2, 1, bytes(8))
    b = bytearray(g)
    b[30:34] = struct.pack("<I", 2)  # BI_RLE4: still a seam (RLE8 is r12)
    with pytest.raises(NotImplementedError, match="compression 2"):
        decode_bmp(bytes(b))
    b = bytearray(g)
    b[28:30] = struct.pack("<H", 4)  # 4-bit
    with pytest.raises(NotImplementedError, match="bit depth 4"):
        decode_bmp(bytes(b))
    b = bytearray(g)
    b[22:26] = struct.pack("<i", -2)  # top-down
    with pytest.raises(NotImplementedError, match="top-down"):
        decode_bmp(bytes(b))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PK\x03\x04")
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_bmp(4, 2, 1, bytes(7))


def test_sniff_and_dispatch(spark):
    from simsearch_spark.multimodal.binary import decode_image, decode_image_meta

    b = encode_bmp(9, 4, 1, bytes([3] * 36))
    assert decode_image(b) == (9, 4, 1, bytes([3] * 36))
    df = spark.createDataFrame(
        [(1, "image", bytearray(b), "image/bmp")],
        "media_id long, kind string, payload binary, mime string",
    )
    (row,) = decode_image_meta(df).collect()
    assert (row.format, row.width, row.height) == ("bmp", 9, 4)


def test_media_pixel_stats_routes_bmp_ids(spark, sf_dir):
    from pyspark.sql import functions as F

    from simsearch_spark.queries.media import q_media_pixel_stats

    rows = q_media_pixel_stats(spark, sf_dir).where(F.col("media_id") % 4 == 2).collect()
    assert rows and all(r.decoded == "ok" for r in rows)
    for r in rows[:5]:
        d, w = int(r.media_id), r.width
        a, b = d % 256, (d * 7 + 13) % 256
        assert r.mean_c0 == round((a * (w // 2) + b * (w - w // 2)) / w, 6)


def test_bmp_rle8_round_trip_and_grammar():
    """BI_RLE8 (r12): encoded runs round-trip for arbitrary gray images;
    the decoder honors absolute literal runs (word-padded), delta moves
    (zero fill), and treats out-of-bounds runs / missing end-of-bitmap
    as malformed."""
    import random
    import struct as _s

    import pytest

    from simsearch_spark.multimodal.binary import decode_image
    from simsearch_spark.multimodal.bmp import (
        _rle8_decode,
        decode_bmp,
        encode_bmp,
    )

    rng = random.Random(11)
    for w, h in [(1, 1), (7, 3), (16, 5), (31, 4)]:
        # runs of random lengths exercise the run coder
        px = bytearray()
        while len(px) < w * h:
            px += bytes([rng.randrange(256)]) * rng.randrange(1, 9)
        px = bytes(px[: w * h])
        blob = encode_bmp(w, h, 1, px, rle=True)
        (comp,) = _s.unpack("<I", blob[30:34])
        assert comp == 1
        assert decode_bmp(blob) == (w, h, 1, px)
        assert decode_image(blob) == (w, h, 1, px)

    # absolute literal run with word padding + delta with zero fill
    # 4x2 bitmap, bottom row: literal [9,8,7] then run 1x5; top row:
    # delta right 2 (zero fill), then run 2x6
    stream = bytes(
        [0, 3, 9, 8, 7, 0]      # absolute 3 literals + pad byte
        + [1, 5, 0, 0]          # run 1x5, end of line
        + [0, 2, 2, 0]          # delta dx=2 dy=0
        + [2, 6, 0, 1]          # run 2x6, end of bitmap
    )
    got = _rle8_decode(stream, 4, 2)
    assert got == bytes([0, 0, 6, 6, 9, 8, 7, 5])

    with pytest.raises(ValueError, match="outside"):
        _rle8_decode(bytes([6, 1, 0, 1]), 4, 1)  # run longer than the row
    with pytest.raises(ValueError, match="end-of-bitmap"):
        _rle8_decode(bytes([2, 1, 0, 0]), 4, 1)  # EOL but no EOB
    with pytest.raises(ValueError, match="truncated RLE8 literal"):
        _rle8_decode(bytes([0, 4, 1, 2]), 8, 1)
    with pytest.raises(ValueError, match="BI_RLE8 with bit depth"):
        bad = bytearray(encode_bmp(2, 2, 3, bytes(12)))
        _s.pack_into("<I", bad, 30, 1)
        decode_bmp(bytes(bad))
