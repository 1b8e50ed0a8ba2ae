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
    with pytest.raises(NotImplementedError, match="P1/P4"):
        decode_netpbm(b"P4\n8 1\n\xff")
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_netpbm(b"P5\n1 1\n65535\n\x00\x00")
    with pytest.raises(ValueError, match="not a netpbm"):
        decode_netpbm(b"P9\n1 1\n255\n\x00")
