"""Regression tests for the round-12 ADVICE items: BMP capability
message currency, BI_BITFIELDS mask-overlap rejection, early
bitfields_565 argument validation, and the 3-component Adobe
transform-2 (YCCK) marker-combination rejection."""

from __future__ import annotations

import struct

import pytest

from simsearch_spark.multimodal.bmp import decode_bmp, encode_bmp
from simsearch_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def test_bmp_depth_seam_message_lists_16():
    """The unsupported-depth message must reflect that 16-bit is now a
    supported depth (ADVICE r12: stale '1/4/8/24/32 only')."""
    blob = bytearray(encode_bmp(2, 2, 3, bytes(12)))
    blob[28:30] = struct.pack("<H", 2)  # claim an unsupported 2-bit depth
    with pytest.raises(NotImplementedError, match=r"1/4/8/16/24/32"):
        decode_bmp(bytes(blob))


def test_bmp_bitfields_overlapping_masks_rejected():
    """Overlapping BI_BITFIELDS channel masks are malformed input and
    must raise ValueError, not decode to garbage-tagged-success."""
    rep5 = (0 << 3) | 0
    blob = bytearray(
        encode_bmp(2, 2, 3, bytes([rep5]) * 12, bits=16, bitfields_565=True)
    )
    # G mask 0x0FE0 is contiguous but overlaps R's 0xF800 in bit 11
    blob[58:62] = struct.pack("<I", 0x0FE0)
    with pytest.raises(ValueError, match="overlap"):
        decode_bmp(bytes(blob))
    # zero-mask / non-contiguous still rejected through _mask_layout
    blob2 = bytearray(
        encode_bmp(2, 2, 3, bytes([rep5]) * 12, bits=16, bitfields_565=True)
    )
    blob2[58:62] = struct.pack("<I", 0)
    with pytest.raises(ValueError, match="mask"):
        decode_bmp(bytes(blob2))


def test_bmp_bitfields_565_validated_before_encode_loop():
    """bitfields_565 with a non-16-bit target fails argument validation
    up front (hoisted per ADVICE r12) for every channel/bits combo."""
    with pytest.raises(ValueError, match="16-bit RGB only"):
        encode_bmp(2, 2, 3, bytes(12), bits=24, bitfields_565=True)
    with pytest.raises(ValueError, match="16-bit RGB only"):
        encode_bmp(2, 2, 3, bytes(12), bitfields_565=True)  # default 24
    with pytest.raises(ValueError, match="16-bit RGB only"):
        encode_bmp(2, 2, 1, bytes(4), bits=8, bitfields_565=True)


def test_jpeg_three_component_ycck_marker_rejected():
    """A 3-component scan whose APP14 transform byte says 2 (YCCK) is an
    inconsistent marker combination — ValueError, not a silent YCbCr
    decode (ADVICE r12)."""
    rgb = bytes([10, 200, 60]) * 4
    blob3 = encode_jpeg(2, 2, 3, rgb)
    app14 = b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" + struct.pack(
        ">HHHB", 100, 0, 0, 2
    )
    spliced = blob3[:2] + app14 + blob3[2:]
    with pytest.raises(ValueError, match="transform 2"):
        decode_jpeg(spliced)


def test_readme_netpbm_scope_mentions_pam():
    with open("README.md", encoding="utf-8") as fh:
        text = fh.read()
    assert "P1–P7" in text and "PAM" in text
