"""Netpbm (PGM/PPM) codec (r12): binary/ASCII round-trips, header
comment/whitespace tolerance, maxval scaling, named seams."""

from __future__ import annotations

import random

import pytest

from simsearch_spark.multimodal.binary import decode_image
from simsearch_spark.multimodal.netpbm import (
    decode_netpbm,
    encode_netpbm,
    parse_netpbm_header,
)


def test_round_trips_binary_and_ascii():
    rng = random.Random(3)
    for ch in (1, 3):
        for w, h in [(1, 1), (7, 3), (16, 5)]:
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            for ascii_variant in (False, True):
                blob = encode_netpbm(w, h, ch, px, ascii_variant)
                assert decode_netpbm(blob) == (w, h, ch, px), (ch, w, h, ascii_variant)
                assert decode_image(blob) == (w, h, ch, px)  # dispatcher
                assert parse_netpbm_header(blob) == (w, h)


def test_header_comments_and_whitespace():
    blob = b"P5 # a comment\n# another\n 3\t2 # sizes\n255\n" + bytes(6)
    assert decode_netpbm(blob) == (3, 2, 1, bytes(6))
    # ASCII samples across arbitrary whitespace
    blob = b"P2\n2 2\n255\n 10\n20\t30    40\n"
    assert decode_netpbm(blob) == (2, 2, 1, bytes([10, 20, 30, 40]))


def test_maxval_scaling_and_errors():
    # maxval 15: values scale by 255/15 = 17 exactly
    blob = b"P5\n4 1\n15\n" + bytes([0, 5, 10, 15])
    assert decode_netpbm(blob)[3] == bytes([0, 85, 170, 255])
    # sample above maxval is malformed
    with pytest.raises(ValueError, match="exceeds maxval"):
        decode_netpbm(b"P5\n2 1\n10\n" + bytes([5, 11]))
    with pytest.raises(ValueError, match="raster holds"):
        decode_netpbm(b"P5\n4 2\n255\n" + bytes(3))
    with pytest.raises(ValueError, match="truncated"):
        decode_netpbm(b"P5\n4")
    with pytest.raises(ValueError, match="> 65535"):
        decode_netpbm(b"P5\n1 1\n70000\n\x00\x00")
    with pytest.raises(ValueError, match="not a netpbm"):
        decode_netpbm(b"P9\n1 1\n255\n\x00")


def test_sixteen_bit_round_trip_exact():
    """maxval 65535 with v*257 samples is the exact widening of 8-bit:
    65535 = 257*255, so (v*257*255*2+65535)//(2*65535) == v for all v."""
    rng = random.Random(7)
    for ch in (1, 3):
        px = bytes(rng.randrange(256) for _ in range(5 * 2 * ch))
        for ascii_variant in (False, True):
            blob = encode_netpbm(5, 2, ch, px, ascii_variant, maxval=65535)
            assert b"65535" in blob[:20]
            assert decode_netpbm(blob) == (5, 2, ch, px)
            assert decode_image(blob) == (5, 2, ch, px)
    # a generic 16-bit maxval still scales round-half-away
    blob = b"P5\n3 1\n1000\n" + bytes([0, 0, 1, 0xE8, 3, 0xE8])
    # samples 0, 0x01E8=488, 0x03E8=1000 → 0, round(488*255/1000)=124, 255
    assert decode_netpbm(blob)[3] == bytes([0, 124, 255])
    with pytest.raises(ValueError, match="raster holds"):
        decode_netpbm(b"P5\n2 1\n65535\n\x00\x00\x00")  # odd byte count


def test_pbm_bitmaps():
    px = bytes([0, 255, 255, 0, 255, 0, 0, 255, 255, 0])  # 5x2
    for ascii_variant in (False, True):
        blob = encode_netpbm(5, 2, 1, px, ascii_variant, bitmap=True)
        assert blob[:2] == (b"P1" if ascii_variant else b"P4")
        assert decode_netpbm(blob) == (5, 2, 1, px)
        assert decode_image(blob) == (5, 2, 1, px)
        assert parse_netpbm_header(blob) == (5, 2)
    # P4 rows pad to byte boundaries: 9 wide → 2 B/row
    px9 = bytes([255] * 9 + [0] * 9)
    blob = encode_netpbm(9, 2, 1, px9, bitmap=True)
    assert len(blob.split(b"\n", 3)[-1]) == 4
    assert decode_netpbm(blob) == (9, 2, 1, px9)
    # P1 digits legally need no separating whitespace
    assert decode_netpbm(b"P1\n# c\n4 1\n0110\n") == (
        4, 1, 1, bytes([255, 0, 0, 255]),
    )
    with pytest.raises(ValueError, match="P1 raster holds"):
        decode_netpbm(b"P1\n4 1\n01\n")
    with pytest.raises(ValueError, match="not 0/1"):
        decode_netpbm(b"P1\n2 1\n02\n")
    with pytest.raises(ValueError, match="P4 raster holds"):
        decode_netpbm(b"P4\n9 2\n\xff\x00\xff")
    with pytest.raises(ValueError, match="pure black/white"):
        encode_netpbm(2, 1, 1, bytes([0, 128]), bitmap=True)


def test_pixel_stats_netpbm_lane(spark, sf_dir):
    """The d%16==13 lane (16-bit P5 / 8-bit P5 / ASCII P2 split) keeps the
    codec-invariant closed-form mean."""
    from pyspark.sql import functions as F

    from simsearch_spark.queries.media import q_media_pixel_stats

    rows = q_media_pixel_stats(spark, sf_dir).where(
        (F.col("media_id") % 16) == 13
    ).collect()
    assert rows and all(r.decoded == "ok" for r in rows)
    seen = {int(r.media_id) % 64 for r in rows}
    assert {13, 45, 29, 61} <= seen  # every sub-lane actually ran
    for r in rows[:8]:
        d, w = int(r.media_id), r.width
        a, b = d % 256, (d * 7 + 13) % 256
        assert r.mean_c0 == round((a * (w // 2) + b * (w - w // 2)) / w, 6)


def test_resize_handles_new_containers(spark):
    """resize_images' real-resample path goes through decode_image, so
    the r12 containers (Netpbm, sub-byte BMP, 16-bit TIFF) resize for
    real rather than falling to the 'stub' tag."""
    from simsearch_spark.multimodal.bmp import encode_bmp
    from simsearch_spark.multimodal.binary import resize_images
    from simsearch_spark.multimodal.png import decode_png
    from simsearch_spark.multimodal.tiff import encode_tiff

    w, h = 600, 40  # wider than the 512 bound → must resample
    px = bytes((i * 7) % 256 for i in range(w * h))
    blobs = [
        (1, encode_netpbm(w, h, 1, px)),
        (2, encode_netpbm(w, h, 1, px, maxval=65535)),
        (3, encode_bmp(w, h, 1, px)),
        (4, encode_tiff(w, h, 1, px, bits_per_sample=16)),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in blobs], "media_id long, payload binary"
    )
    rows = {r.media_id: r for r in resize_images(df).collect()}
    for i, _b in blobs:
        r = rows[i]
        assert r.resized == "resized", i
        assert (r.dst_width, r.dst_height) == (512, 34)
        dw, dh, ch, dpix = decode_png(bytes(r.payload))
        assert (dw, dh, ch) == (512, 34, 1)
        # nearest-neighbor: spot-check a mapped pixel
        assert dpix[0] == px[0]


def test_pam_p7():
    """r12: P7/PAM — GRAYSCALE and RGB tuples, 8- and 16-bit, header
    comments and unknown keys tolerated; r13: ALPHA tuples decode at
    2/4 channels (the PNG convention), depth/tupltype contradictions
    are malformed."""
    from simsearch_spark.multimodal.netpbm import encode_pam

    rng = random.Random(19)
    for ch in (1, 2, 3, 4):
        px = bytes(rng.randrange(256) for _ in range(4 * 3 * ch))
        for mx in (255, 65535):
            blob = encode_pam(4, 3, ch, px, maxval=mx)
            assert decode_netpbm(blob) == (4, 3, ch, px), (ch, mx)
            assert decode_image(blob) == (4, 3, ch, px)
            assert parse_netpbm_header(blob) == (4, 3)
    # comments and unknown header keys are skipped per spec
    blob = (b"P7\n# c\nWIDTH 2\nXROLL 9\nHEIGHT 1\nDEPTH 1\n"
            b"MAXVAL 255\nTUPLTYPE GRAYSCALE\nENDHDR\nAB")
    assert decode_netpbm(blob) == (2, 1, 1, b"AB")
    # GRAYSCALE_ALPHA decodes (r12 seam closed in r13)
    assert decode_netpbm(
        b"P7\nWIDTH 1\nHEIGHT 1\nDEPTH 2\nMAXVAL 255\n"
        b"TUPLTYPE GRAYSCALE_ALPHA\nENDHDR\nAB"
    ) == (1, 1, 2, b"AB")
    with pytest.raises(ValueError, match="contradicts"):
        decode_netpbm(b"P7\nWIDTH 1\nHEIGHT 1\nDEPTH 3\nMAXVAL 255\n"
                      b"TUPLTYPE GRAYSCALE_ALPHA\nENDHDR\nABC")
    with pytest.raises(NotImplementedError, match="ALPHA"):
        decode_netpbm(b"P7\nWIDTH 1\nHEIGHT 1\nDEPTH 2\nMAXVAL 255\n"
                      b"TUPLTYPE CMYK_ALPHA\nENDHDR\nAB")
    with pytest.raises(ValueError, match="missing DEPTH"):
        decode_netpbm(b"P7\nWIDTH 1\nHEIGHT 1\nMAXVAL 255\nENDHDR\nA")
    with pytest.raises(ValueError, match="no ENDHDR"):
        decode_netpbm(b"P7\nWIDTH 1\nHEIGHT 1\nDEPTH 1\nMAXVAL 255\n")
    with pytest.raises(ValueError, match="PAM raster holds"):
        decode_netpbm(b"P7\nWIDTH 3\nHEIGHT 1\nDEPTH 1\nMAXVAL 255\nENDHDR\nAB")


def test_pam_unknown_tupltype_is_a_seam():
    """Review r13: ANY unknown declared tuple type is a named seam —
    a CMYK PAM must not decode its cyan plane as gray labeled 'ok'."""
    with pytest.raises(NotImplementedError, match="CMYK"):
        decode_netpbm(b"P7\nWIDTH 1\nHEIGHT 1\nDEPTH 4\nMAXVAL 255\n"
                      b"TUPLTYPE CMYK\nENDHDR\nABCD")
    # an undeclared tupltype still decodes by depth (optional per spec)
    assert decode_netpbm(
        b"P7\nWIDTH 1\nHEIGHT 1\nDEPTH 4\nMAXVAL 255\nENDHDR\nABCD"
    ) == (1, 1, 4, b"ABCD")
