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
    # r13: BI_JPEG decodes now — garbage where the stream should be is
    # malformed, not a seam; compression 6 (BI_ALPHABITFIELDS) remains one
    b[30:34] = struct.pack("<I", 4)
    with pytest.raises(ValueError, match="not a JPEG payload"):
        decode_bmp(bytes(b))
    b = bytearray(g)
    # r13: BI_ALPHABITFIELDS decodes — claiming it at 8 bits is malformed
    b[30:34] = struct.pack("<I", 6)
    with pytest.raises(ValueError, match="16/32 only"):
        decode_bmp(bytes(b))
    b = bytearray(g)
    # r14: BI_CMYK is PINNED metafile-only (ValueError — malformed in a
    # standalone BMP, not a decodable seam); see test_bi_cmyk_pinned
    b[30:34] = struct.pack("<I", 11)
    with pytest.raises(ValueError, match="metafile-only"):
        decode_bmp(bytes(b))
    b = bytearray(g)
    b[28:30] = struct.pack("<H", 2)  # 2-bit: not a legal BMP depth
    with pytest.raises(NotImplementedError, match="bit depth 2"):
        decode_bmp(bytes(b))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PK\x03\x04")
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_bmp(4, 2, 1, bytes(7))


def test_sixteen_bit_555_round_trip():
    """r12: BI_RGB 16-bit (implied 5-5-5) — exact on the bit-replication
    level set, both row orders."""
    rng = random.Random(14)
    rep = [(c5 << 3) | (c5 >> 2) for c5 in range(32)]
    for w, h in [(1, 1), (5, 3), (6, 2)]:
        px = bytes(rng.choice(rep) for _ in range(3 * w * h))
        for td in (False, True):
            blob = encode_bmp(w, h, 3, px, bits=16, top_down=td)
            assert struct.unpack("<H", blob[28:30])[0] == 16
            assert decode_bmp(blob) == (w, h, 3, px), (w, h, td)
    with pytest.raises(ValueError, match="5-bit-replicated"):
        encode_bmp(1, 1, 3, bytes([1, 2, 3]), bits=16)


def test_sub_byte_depths_round_trip():
    """r12: 1- and 4-bit palette bitmaps — the palette carries the
    image's distinct gray values, so arbitrary two-tone images
    round-trip exactly at 1 bit (the media-lane trick)."""
    rng = random.Random(5)
    for w, h in [(1, 1), (5, 3), (9, 2), (33, 4)]:
        # 1-bit: any two gray values
        a, b = rng.randrange(256), rng.randrange(256)
        px = bytes(rng.choice([a, b]) for _ in range(w * h))
        blob = encode_bmp(w, h, 1, px, bits=1)
        assert struct.unpack("<H", blob[28:30])[0] == 1
        assert decode_bmp(blob) == (w, h, 1, px), (w, h, "1-bit")
        # 4-bit: up to 16 distinct values
        vals = [rng.randrange(256) for _ in range(16)]
        px = bytes(rng.choice(vals) for _ in range(w * h))
        blob = encode_bmp(w, h, 1, px, bits=4)
        assert struct.unpack("<H", blob[28:30])[0] == 4
        assert decode_bmp(blob) == (w, h, 1, px), (w, h, "4-bit")
    with pytest.raises(ValueError, match="distinct values"):
        encode_bmp(3, 1, 1, bytes([1, 2, 3]), bits=1)


def test_top_down_and_32bit():
    rng = random.Random(6)
    for w, h in [(1, 1), (5, 3), (31, 2)]:
        px3 = bytes(rng.randrange(256) for _ in range(3 * w * h))
        blob = encode_bmp(w, h, 3, px3, top_down=True)
        assert struct.unpack("<i", blob[22:26])[0] == -h
        assert parse_bmp_header(blob) == (w, h)
        assert decode_bmp(blob) == (w, h, 3, px3), (w, h, "top-down")
        # top-down palette bitmaps too
        px = bytes(rng.randrange(256) for _ in range(w * h))
        assert decode_bmp(encode_bmp(w, h, 1, px, top_down=True)) == (w, h, 1, px)
    # 32-bit BGRX: synthesize by widening a 24-bit body
    w, h = 3, 2
    px3 = bytes(range(18))
    rows = b"".join(
        b"".join(
            bytes((px3[3 * (y * w + x) + 2], px3[3 * (y * w + x) + 1],
                   px3[3 * (y * w + x)], 0xAA))
            for x in range(w)
        )
        for y in range(h - 1, -1, -1)
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(rows), 0, 0, 0, 0)
    blob = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54) + info + rows
    assert decode_bmp(blob) == (w, h, 3, px3)
    with pytest.raises(ValueError, match="top-down RLE"):
        encode_bmp(2, 2, 1, bytes(4), rle=True, top_down=True)


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


def test_bmp_rle4_round_trip_and_grammar():
    """BI_RLE4 (r12): encoded runs round-trip; the decoder honors
    nibble-alternating runs, word-padded absolute nibble runs, delta
    moves, and flags out-of-bounds / unterminated streams."""
    import struct as _s

    from simsearch_spark.multimodal.binary import decode_image
    from simsearch_spark.multimodal.bmp import _rle4_decode

    rng = random.Random(12)
    for w, h in [(1, 1), (7, 3), (16, 5), (31, 4)]:
        vals = [rng.randrange(256) for _ in range(16)]
        px = bytearray()
        while len(px) < w * h:
            px += bytes([rng.choice(vals)]) * rng.randrange(1, 6)
        px = bytes(px[: w * h])
        blob = encode_bmp(w, h, 1, px, rle=True, bits=4)
        (comp,) = _s.unpack("<I", blob[30:34])
        assert comp == 2
        assert decode_bmp(blob) == (w, h, 1, px)
        assert decode_image(blob) == (w, h, 1, px)

    # encoded run ALTERNATES the two nibbles of v: 5 x 0x9A → 9 A 9 A 9
    assert _rle4_decode(bytes([5, 0x9A, 0, 1]), 5, 1) == bytes([9, 10, 9, 10, 9])
    # absolute run of 3 nibbles (2 packed bytes, already word-aligned:
    # ceil(3/2)=2 is even so NO pad), then a run, then delta right 1 on
    # the next row
    stream = bytes(
        [0, 3, 0x12, 0x30]     # absolute nibbles 1,2,3 (low pad nibble)
        + [1, 0x44, 0, 0]      # run 1x4, end of line
        + [0, 2, 1, 0]         # delta dx=1
        + [3, 0x5F, 0, 1]      # run 3: 5 F 5, end of bitmap
    )
    got = _rle4_decode(stream, 4, 2)
    assert got == bytes([0, 5, 15, 5, 1, 2, 3, 4])

    with pytest.raises(ValueError, match="outside"):
        _rle4_decode(bytes([6, 0x11, 0, 1]), 4, 1)
    with pytest.raises(ValueError, match="end-of-bitmap"):
        _rle4_decode(bytes([2, 0x11, 0, 0]), 4, 1)
    with pytest.raises(ValueError, match="truncated RLE4 literal"):
        _rle4_decode(bytes([0, 5, 0x12]), 8, 1)
    with pytest.raises(ValueError, match="BI_RLE4 with bit depth"):
        bad = bytearray(encode_bmp(2, 2, 1, bytes(4)))
        _s.pack_into("<I", bad, 30, 2)
        decode_bmp(bytes(bad))
    # top-down + RLE in the container is malformed, not a seam
    bad = bytearray(encode_bmp(2, 2, 1, bytes([0, 0, 1, 1]), rle=True, bits=4))
    _s.pack_into("<i", bad, 22, -2)
    with pytest.raises(ValueError, match="top-down RLE"):
        decode_bmp(bytes(bad))


def test_bitfields_565_and_32bit_masks():
    """r12: BI_BITFIELDS — 5-6-5 words round-trip on the replication
    level sets (both row orders); 32-bit masked DWORDs honor arbitrary
    contiguous mask placement; malformed masks are rejected."""
    from simsearch_spark.multimodal.bmp import _replicate

    rng = random.Random(15)
    rep5 = sorted({_replicate(v, 5) for v in range(32)})
    rep6 = sorted({_replicate(v, 6) for v in range(64)})
    for w, h in [(1, 1), (5, 3), (6, 2)]:
        px = bytes(
            c for _ in range(w * h)
            for c in (rng.choice(rep5), rng.choice(rep6), rng.choice(rep5))
        )
        for td in (False, True):
            blob = encode_bmp(w, h, 3, px, bits=16, bitfields_565=True,
                              top_down=td)
            assert struct.unpack("<I", blob[30:34])[0] == 3
            assert decode_bmp(blob) == (w, h, 3, px), (w, h, td)
    with pytest.raises(ValueError, match="6-bit-replicated"):
        encode_bmp(1, 1, 3, bytes([0, 1, 0]), bits=16, bitfields_565=True)

    # 32-bit BI_BITFIELDS with XBGR-ordered 8-8-8 masks (hand-built)
    w, h = 3, 2
    px = bytes(range(18))
    rows = b"".join(
        b"".join(
            struct.pack(
                "<I",
                (px[3 * (y * w + x)])            # R in bits 0-7
                | (px[3 * (y * w + x) + 1] << 8)   # G in bits 8-15
                | (px[3 * (y * w + x) + 2] << 16), # B in bits 16-23
            )
            for x in range(w)
        )
        for y in range(h - 1, -1, -1)
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 3, len(rows), 0, 0, 0, 0)
    masks = struct.pack("<III", 0x0000FF, 0x00FF00, 0xFF0000)
    blob = (
        struct.pack("<2sIHHI", b"BM", 66 + len(rows), 0, 0, 66)
        + info + masks + rows
    )
    assert decode_bmp(blob) == (w, h, 3, px)

    # non-contiguous / zero masks are malformed
    bad = bytearray(blob)
    struct.pack_into("<I", bad, 54, 0x0000F5)
    with pytest.raises(ValueError, match="not contiguous"):
        decode_bmp(bytes(bad))
    struct.pack_into("<I", bad, 54, 0)
    with pytest.raises(ValueError, match="mask 0x0"):
        decode_bmp(bytes(bad))
    # BI_BITFIELDS at 8 bits is malformed
    g = bytearray(encode_bmp(2, 2, 1, bytes(4)))
    struct.pack_into("<I", g, 30, 3)
    with pytest.raises(ValueError, match="BI_BITFIELDS with bit depth"):
        decode_bmp(bytes(g) + bytes(12))


def test_wide_bitfields_masks_are_a_seam():
    """Self-review r12: legal >8-bit channel masks (A2R10G10B10) are a
    named seam, not a malformed-input error."""
    w, h = 1, 1
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 3, 4, 0, 0, 0, 0)
    masks = struct.pack("<III", 0x3FF00000, 0x000FFC00, 0x000003FF)
    blob = (
        struct.pack("<2sIHHI", b"BM", 70, 0, 0, 66) + info + masks + bytes(4)
    )
    with pytest.raises(NotImplementedError, match="width 10"):
        decode_bmp(blob)


def test_os2_core_header():
    """r13: OS/2 BITMAPCOREHEADER (12-byte header, 16-bit geometry,
    RGBTRIPLE palette) — 24-bit direct and 1/4/8-bit palettes decode;
    illegal core depths are malformed."""
    def build_core(w, h, bits, palette_rgb, rows):
        off = 14 + 12 + len(palette_rgb)
        hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
        core = struct.pack("<IHHHH", 12, w, h, 1, bits)
        return hdr + core + palette_rgb + rows

    # 24-bit: bottom-up BGR rows, 4-byte stride
    w, h = 3, 2
    px = bytes(range(3 * w * h))
    stride = (w * 3 + 3) & ~3
    rows = b"".join(
        bytes(
            v for x in range(w)
            for v in px[3 * (y * w + x) : 3 * (y * w + x) + 3][::-1]
        ).ljust(stride, b"\x00")
        for y in range(h - 1, -1, -1)
    )
    assert decode_bmp(build_core(w, h, 24, b"", rows)) == (w, h, 3, px)

    # 8-bit gray palette (RGB triples, full 256 entries)
    pal = b"".join(bytes([i, i, i]) for i in range(256))
    w, h = 5, 3
    idx = bytes((i * 37) & 0xFF for i in range(w * h))
    stride = (w + 3) & ~3
    rows = b"".join(
        idx[y * w : (y + 1) * w].ljust(stride, b"\x00")
        for y in range(h - 1, -1, -1)
    )
    assert decode_bmp(build_core(w, h, 8, pal, rows)) == (w, h, 1, idx)

    # 1-bit two-tone
    pal1 = bytes([0, 0, 0, 255, 255, 255])
    bitsrow = bytes([0b10110000.to_bytes(1, "big")[0], 0, 0, 0])
    got = decode_bmp(build_core(4, 1, 1, pal1, bitsrow))
    assert got == (4, 1, 1, bytes([255, 0, 255, 255]))

    with pytest.raises(ValueError, match="core BMP with bit depth 16"):
        decode_bmp(build_core(2, 1, 16, b"", bytes(4)))
    # r14: header sizes 16..64 parse as OS/2 2.x
    # (test_os2_v2_truncated_and_full_headers); 13..15 remain malformed
    blob = bytearray(build_core(2, 1, 24, b"", bytes(8)))
    blob[14:18] = struct.pack("<I", 14)
    with pytest.raises(NotImplementedError, match="header size 14"):
        decode_bmp(bytes(blob))


def test_bi_jpeg_and_bi_png_passthrough():
    """r13: BI_JPEG (4) / BI_PNG (5) — the pixel data is a complete
    embedded stream routed to the in-repo codecs; header geometry must
    agree."""
    from simsearch_spark.multimodal.jpeg import encode_jpeg
    from simsearch_spark.multimodal.png import encode_png

    w, h = 8, 6
    px = bytes((x * 30 + y) & 0xFF for y in range(h) for x in range(w))

    def wrap(stream, comp, hw=w, hh=h):
        off = 14 + 40
        hdr = struct.pack("<2sIHHI", b"BM", off + len(stream), 0, 0, off)
        info = struct.pack(
            "<IiiHHIIiiII", 40, hw, hh, 1, 0, comp, len(stream),
            2835, 2835, 0, 0,
        )
        return hdr + info + stream

    png = encode_png(w, h, 1, px)
    assert decode_bmp(wrap(png, 5)) == (w, h, 1, px)
    jpg = encode_jpeg(w, h, 1, bytes([77] * (w * h)), quality=90)
    jw, jh, jch, jpx = decode_bmp(wrap(jpg, 4))
    assert (jw, jh, jch) == (w, h, 1)  # block-constant: decodes exactly
    assert jpx == bytes([77] * (w * h))
    with pytest.raises(ValueError, match="stream geometry"):
        decode_bmp(wrap(png, 5, hw=w + 1))


def test_bi_alphabitfields():
    """r13: compression 6 (BI_ALPHABITFIELDS) — four mask DWORDs; a
    nonzero alpha mask appends a 4th channel (the PNG convention), a
    zero alpha mask decodes like BI_BITFIELDS, overlap with a color
    mask is malformed."""
    def build(bits, masks4, rows, w, h):
        off = 14 + 40 + 16
        hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bits, 6, len(rows), 2835, 2835, 0, 0,
        )
        return hdr + info + struct.pack("<4I", *masks4) + rows

    # 32-bit ARGB (A8-R8-G8-B8): one bottom-up row of two pixels
    px = [(10, 20, 30, 40), (200, 150, 100, 255)]  # RGBA
    words = [
        (a << 24) | (r << 16) | (g << 8) | b for r, g, b, a in px
    ]
    rows = struct.pack("<2I", *words)
    got = decode_bmp(build(32, (0xFF0000, 0xFF00, 0xFF, 0xFF000000), rows, 2, 1))
    assert got == (2, 1, 4, bytes(v for p in px for v in p))

    # zero alpha mask: plain 3-channel BI_BITFIELDS semantics
    got3 = decode_bmp(build(32, (0xFF0000, 0xFF00, 0xFF, 0), rows, 2, 1))
    assert got3 == (2, 1, 3, bytes(v for p in px for v in p[:3]))

    # 16-bit 4-4-4-4: exact on the 17-multiple replication level set
    v = lambda n: n * 17  # noqa: E731
    word = (0xA << 12) | (0x3 << 8) | (0x7 << 4) | 0xC  # A R G B
    rows16 = struct.pack("<HH", word, word)
    got16 = decode_bmp(build(16, (0xF00, 0xF0, 0xF, 0xF000), rows16, 2, 1))
    assert got16 == (2, 1, 4, bytes([v(3), v(7), v(0xC), v(0xA)] * 2))

    # alpha mask overlapping a color mask is malformed
    with pytest.raises(ValueError, match="overlaps"):
        decode_bmp(build(32, (0xFF0000, 0xFF00, 0xFF, 0xFF), rows, 2, 1))


def _os2_bmp(hdr_size, w, h, bits, pixels_8bit_gray, comp=None):
    """Hand-built OS/2 2.x BMP: variable header length (16..64), Windows
    field layout for present fields, 4-byte palette entries."""
    n_colors = 1 << bits
    pal = b"".join(bytes((v, v, v, 0)) for v in range(0, 256, 256 // n_colors))
    stride = ((w * bits + 31) // 32) * 4
    body = bytearray(stride * h)
    lut = {v: i for i, v in enumerate(range(0, 256, 256 // n_colors))}
    for y in range(h):
        dst = (h - 1 - y) * stride
        for x in range(w):
            body[dst + x] = lut[pixels_8bit_gray[y * w + x]]
    hdr = bytearray(hdr_size)
    struct.pack_into("<I", hdr, 0, hdr_size)
    struct.pack_into("<ii", hdr, 4, w, h)
    struct.pack_into("<HH", hdr, 12, 1, bits)
    if comp is not None:
        assert hdr_size >= 20
        struct.pack_into("<I", hdr, 16, comp)
    off = 14 + hdr_size + len(pal)
    return (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + bytes(hdr) + pal + bytes(body)
    )


def test_os2_v2_truncated_and_full_headers():
    """r14 (closes the OS/2 2.x seam): header lengths 16 (no compression
    field), 24, and the full 64 all parse with the Windows field layout
    and the palette at 14+hdr_size."""
    px = bytes([0, 255, 255, 0, 0, 0, 255, 255])  # 4x2 gray
    for hdr_size in (16, 24, 64):
        blob = _os2_bmp(hdr_size, 4, 2, 8, px,
                        comp=0 if hdr_size >= 20 else None)
        w, h, ch, got = decode_bmp(blob)
        assert (w, h, ch) == (4, 2, 1)
        assert got == px, hdr_size


def test_os2_v2_huffman_and_rle24_pinned():
    """Under an OS/2 2.x header, compression 3/4 mean Huffman-1D/RLE24
    (NOT BI_BITFIELDS/BI_JPEG) — pinned loud seams, never misread as the
    Windows enums."""
    px = bytes(8)
    for hdr_size in (64, 44):  # full AND truncated 2.x lengths (review r14)
        for comp, name in ((3, "Huffman 1D"), (4, "RLE24")):
            blob = _os2_bmp(hdr_size, 4, 2, 8, px, comp=comp)
            with pytest.raises(NotImplementedError, match=name):
                decode_bmp(blob)
    # Windows V2/V3 header sizes (52/56) keep their Windows enums — a
    # 52-byte header with comp 3 parses as BI_BITFIELDS, not Huffman
    blob = bytearray(encode_bmp(2, 2, 3, bytes(12)))
    with pytest.raises((ValueError, NotImplementedError)) as ei:
        struct.pack_into("<I", blob, 14, 52)
        struct.pack_into("<I", blob, 30, 3)
        decode_bmp(bytes(blob))
    assert "Huffman" not in str(ei.value)


def test_bi_cmyk_pinned_metafile_only():
    """PERMANENT pin (r14): BI_CMYK-family compressions (11/12/13) are
    metafile-only per the BITMAPINFOHEADER contract — a standalone BMP
    carrying them is malformed input (ValueError), not a decode."""
    blob = bytearray(encode_bmp(2, 2, 3, bytes(12)))
    for comp in (11, 12, 13):
        struct.pack_into("<I", blob, 30, comp)
        with pytest.raises(ValueError, match="metafile-only"):
            decode_bmp(bytes(blob))
