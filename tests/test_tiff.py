"""Tests for the baseline TIFF codec (multimodal/tiff.py)."""

import random
import struct

import pytest

from simsearch_spark.multimodal.tiff import decode_tiff, encode_tiff, parse_tiff_header


def test_roundtrips_both_byte_orders_and_depths():
    rng = random.Random(6)
    for w, h in [(1, 1), (5, 3), (31, 7), (64, 64), (33, 2)]:
        for be in (False, True):
            px = bytes(rng.randrange(256) for _ in range(w * h))
            t = encode_tiff(w, h, 1, px, big_endian=be)
            assert t[:2] == (b"MM" if be else b"II")
            assert parse_tiff_header(t) == (w, h)
            assert decode_tiff(t) == (w, h, 1, px), (w, h, be)
            px3 = bytes(rng.randrange(256) for _ in range(3 * w * h))
            assert decode_tiff(encode_tiff(w, h, 3, px3, big_endian=be)) == (w, h, 3, px3)


def test_multi_strip_assembly():
    """Hand-rebuild a 2-strip file: strips must concatenate top-down."""
    px = bytes(range(48))  # 4x4 RGB
    t = bytearray(encode_tiff(4, 4, 3, px))
    # single strip starts where tag 273's LONG points; split it in two by
    # rewriting StripOffsets/ByteCounts as 2-count arrays appended at end
    bo = "<"
    (ifd_n,) = struct.unpack(bo + "H", t[8:10])
    strip_off = None
    for i in range(ifd_n):
        p = 10 + 12 * i
        tag, typ, cnt = struct.unpack(bo + "HHI", t[p : p + 8])
        if tag == 273:
            (strip_off,) = struct.unpack(bo + "I", t[p + 8 : p + 12])
            off_entry = p
        if tag == 279:
            cnt_entry = p
    half = 24
    arr_off = len(t)
    t += struct.pack(bo + "II", strip_off, strip_off + half)        # offsets
    t += struct.pack(bo + "II", half, half)                          # counts
    t[off_entry : off_entry + 12] = struct.pack(bo + "HHII", 273, 4, 2, arr_off)
    t[cnt_entry : cnt_entry + 12] = struct.pack(bo + "HHII", 279, 4, 2, arr_off + 8)
    assert decode_tiff(bytes(t)) == (4, 4, 3, px)


def test_named_seams():
    t = bytearray(encode_tiff(4, 2, 1, bytes(8)))
    bo = "<"

    def set_tag(buf, tag, typ, cnt, val4, repurpose=None):
        """Rewrite entry ``tag`` — or entry ``repurpose`` INTO ``tag`` when
        the encoder never writes it (e.g. 284: the decoder defaults it)."""
        (n,) = struct.unpack(bo + "H", buf[8:10])
        for i in range(n):
            p = 10 + 12 * i
            if struct.unpack(bo + "H", buf[p : p + 2])[0] == (repurpose or tag):
                buf[p : p + 12] = struct.pack(bo + "HHI", tag, typ, cnt) + val4
                return
        raise KeyError(tag)

    b = bytearray(t)
    set_tag(b, 259, 3, 1, struct.pack(bo + "HH", 5, 0))  # LZW
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode_tiff(bytes(b))
    b = bytearray(t)
    set_tag(b, 262, 3, 1, struct.pack(bo + "HH", 0, 0))  # WhiteIsZero
    with pytest.raises(NotImplementedError, match="photometric 0"):
        decode_tiff(bytes(b))
    b = bytearray(t)
    # repurpose the RowsPerStrip entry (unused by strip assembly) as 284
    set_tag(b, 284, 3, 1, struct.pack(bo + "HH", 2, 0), repurpose=278)
    with pytest.raises(NotImplementedError, match="planar"):
        decode_tiff(bytes(b))
    b = bytearray(t)
    b[-2:] = b""  # truncate the strip
    with pytest.raises(ValueError, match="strip"):
        decode_tiff(bytes(b))
    # multi-page: point the next-IFD offset back at the first IFD
    b = bytearray(t)
    (n,) = struct.unpack(bo + "H", b[8:10])
    nxt_pos = 10 + 12 * n
    b[nxt_pos : nxt_pos + 4] = struct.pack(bo + "I", 8)
    with pytest.raises(NotImplementedError, match="multi-page"):
        decode_tiff(bytes(b))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"II+\x00")


def test_sniff_dispatch_and_query_routing(spark, sf_dir):
    from pyspark.sql import functions as F

    from simsearch_spark.multimodal.binary import decode_image, decode_image_meta
    from simsearch_spark.queries.media import q_media_pixel_stats

    t = encode_tiff(7, 2, 1, bytes([9] * 14), big_endian=True)
    assert decode_image(t) == (7, 2, 1, bytes([9] * 14))
    df = spark.createDataFrame(
        [(1, "image", bytearray(t), "image/tiff")],
        "media_id long, kind string, payload binary, mime string",
    )
    (row,) = decode_image_meta(df).collect()
    assert (row.format, row.width, row.height) == ("tiff", 7, 2)

    rows = q_media_pixel_stats(spark, sf_dir).where(
        (F.col("media_id") % 8).isin(3, 7)
    ).collect()
    assert rows and all(r.decoded == "ok" for r in rows)
    for r in rows[:6]:
        d, w = int(r.media_id), r.width
        a, b = d % 256, (d * 7 + 13) % 256
        assert r.mean_c0 == round((a * (w // 2) + b * (w - w // 2)) / w, 6)
