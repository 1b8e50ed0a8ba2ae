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
    # old-style JPEG (6, deprecated by TechNote 2): still a seam
    set_tag(b, 259, 3, 1, struct.pack(bo + "HH", 6, 0))
    with pytest.raises(NotImplementedError, match="compression 6"):
        decode_tiff(bytes(b))
    b = bytearray(t)
    # r13: CCITT G4 decodes now — but claiming it on an 8-bit gray file
    # is malformed (bilevel only), not a seam
    set_tag(b, 259, 3, 1, struct.pack(bo + "HH", 4, 0))
    with pytest.raises(ValueError, match="bilevel only"):
        decode_tiff(bytes(b))
    b = bytearray(t)
    set_tag(b, 262, 3, 1, struct.pack(bo + "HH", 5, 0))  # CMYK: still a seam
    with pytest.raises(NotImplementedError, match="photometric 5"):
        decode_tiff(bytes(b))
    b = bytearray(t)
    # repurpose the RowsPerStrip entry (unused by strip assembly) as 284;
    # r11: planar config 2 is implemented — an INVALID config still raises
    set_tag(b, 284, 3, 1, struct.pack(bo + "HH", 3, 0), repurpose=278)
    with pytest.raises(NotImplementedError, match="planar configuration 3"):
        decode_tiff(bytes(b))
    b = bytearray(t)
    b[-2:] = b""  # truncate the strip
    with pytest.raises(ValueError, match="strip"):
        decode_tiff(bytes(b))
    # r12: a second IFD no longer raises — page 0 still decodes even when
    # the chain continues (here: degenerately, back onto itself)
    b = bytearray(t)
    (n,) = struct.unpack(bo + "H", b[8:10])
    nxt_pos = 10 + 12 * n
    b[nxt_pos : nxt_pos + 4] = struct.pack(bo + "I", 8)
    assert decode_tiff(bytes(b)) == decode_tiff(t)
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
        if d % 128 in (23, 87) or d % 64 == 39:
            # r13 bilevel CCITT lanes threshold the half values
            a, b = 255 * (a >= 128), 255 * (b >= 128)
        assert r.mean_c0 == round((a * (w // 2) + b * (w - w // 2)) / w, 6)


# -----------------------------------------------------------------------------
# r11: PackBits + LZW (+ predictor 2)
# -----------------------------------------------------------------------------


def test_packbits_spec_vector():
    """The TN1023/TIFF-spec worked example, both directions."""
    from simsearch_spark.multimodal.tiff import packbits, unpackbits

    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    unpacked = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22") + b"\xaa" * 10
    assert unpackbits(packed, len(unpacked)) == unpacked
    assert packbits(unpacked) == packed  # maximal-run packer reproduces it
    # no-op byte (0x80) is skipped
    assert unpackbits(b"\x80\x00A", 1) == b"A"
    with pytest.raises(ValueError, match="truncated PackBits"):
        unpackbits(b"\x05AB", 6)


def test_packbits_roundtrip_stress():
    from simsearch_spark.multimodal.tiff import packbits, unpackbits

    rng = random.Random(17)
    for trial in range(30):
        n = rng.randrange(1, 700)
        # runs-heavy data: pick from a tiny alphabet with repeat stretches
        data = bytearray()
        while len(data) < n:
            data += bytes([rng.randrange(4)]) * rng.randrange(1, 200)
        data = bytes(data[:n])
        assert unpackbits(packbits(data), n) == data, trial


def test_tiff_lzw_hand_vector():
    """Hand-derived bit-exact stream for input 07 07 07 08: codes
    [Clear=256, 7, 258, 8, EOI=257], all 9 bits wide, MSB-first —
    100000000 000000111 100000010 000001000 100000001 packed to bytes.
    Pins the TIFF bit order (GIF packs LSB-first) and code numbering."""
    from simsearch_spark.multimodal.tiff import lzw_decode_tiff, lzw_encode_tiff

    bits = "".join(format(c, "09b") for c in (256, 7, 258, 8, 257))
    bits += "0" * (-len(bits) % 8)
    expect = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert lzw_encode_tiff(b"\x07\x07\x07\x08") == expect
    assert lzw_decode_tiff(expect, 4) == b"\x07\x07\x07\x08"


def test_tiff_lzw_roundtrip_crosses_width_boundaries_and_reset():
    """Inputs large/diverse enough to cross the 510/1022/2046 EARLY width
    changes and the 4094 table reset."""
    from simsearch_spark.multimodal.tiff import lzw_decode_tiff, lzw_encode_tiff

    rng = random.Random(23)
    big = bytes(rng.randrange(256) for _ in range(30_000))  # ~incompressible
    assert lzw_decode_tiff(lzw_encode_tiff(big), len(big)) == big
    runs = b"".join(bytes([i & 0xFF]) * (i % 37 + 1) for i in range(1500))
    assert lzw_decode_tiff(lzw_encode_tiff(runs), len(runs)) == runs
    for n in (0, 1, 2, 509, 510, 511, 1023, 2047):
        d = bytes((i * 7) & 0xFF for i in range(n))
        assert lzw_decode_tiff(lzw_encode_tiff(d), n) == d, n


def test_compressed_tiff_roundtrips_all_modes():
    rng = random.Random(29)
    for w, h in [(1, 1), (9, 4), (33, 17)]:
        for ch in (1, 3):
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            for be in (False, True):
                for kw in (
                    {"compression": "packbits"},
                    {"compression": "lzw"},
                    {"compression": "lzw", "predictor": 2},
                ):
                    t = encode_tiff(w, h, ch, px, big_endian=be, **kw)
                    assert decode_tiff(t) == (w, h, ch, px), (w, h, ch, be, kw)
    # predictor 2 really pays on smooth data (the reason it exists)
    smooth = bytes(min(255, i // 3) for i in range(96 * 32))
    plain = encode_tiff(96, 32, 1, smooth, compression="lzw")
    pred = encode_tiff(96, 32, 1, smooth, compression="lzw", predictor=2)
    assert len(pred) < len(plain)
    with pytest.raises(ValueError, match="predictor 2 requires"):
        encode_tiff(2, 2, 1, bytes(4), compression="packbits", predictor=2)


def test_multi_strip_lzw_strips_decompress_independently():
    """Per spec, compression state never crosses strip boundaries: a
    hand-built 2-strip LZW file (each strip its own LZW stream) must
    decode; concatenating the streams as one strip must NOT."""
    from simsearch_spark.multimodal.tiff import lzw_encode_tiff

    w, h = 6, 4
    px = bytes((i * 11) & 0xFF for i in range(w * h))
    top, bottom = px[: w * 2], px[w * 2 :]
    s1, s2 = lzw_encode_tiff(top), lzw_encode_tiff(bottom)
    bo = "<"
    entries = []
    n_entries = 10
    ifd_size = 2 + 12 * n_entries + 4
    arr_off = 8 + ifd_size
    strip1_off = arr_off + 16
    strip2_off = strip1_off + len(s1)

    def short(v):
        return struct.pack(bo + "HH", v, 0)

    def long_(v):
        return struct.pack(bo + "I", v)

    entries.append((256, 3, 1, short(w)))
    entries.append((257, 3, 1, short(h)))
    entries.append((258, 3, 1, short(8)))
    entries.append((259, 3, 1, short(5)))
    entries.append((262, 3, 1, short(1)))
    entries.append((273, 4, 2, long_(arr_off)))
    entries.append((277, 3, 1, short(1)))
    entries.append((278, 3, 1, short(2)))  # 2 rows per strip
    entries.append((279, 4, 2, long_(arr_off + 8)))
    entries.append((317, 3, 1, short(1)))
    t = bytearray()
    t += b"II*\x00" + struct.pack(bo + "I", 8)
    t += struct.pack(bo + "H", n_entries)
    for tag, typ, cnt, val in sorted(entries):
        t += struct.pack(bo + "HHI", tag, typ, cnt) + val
    t += struct.pack(bo + "I", 0)
    t += struct.pack(bo + "II", strip1_off, strip2_off)
    t += struct.pack(bo + "II", len(s1), len(s2))
    t += s1 + s2
    assert decode_tiff(bytes(t)) == (w, h, 1, px)


def _build_tiff(entries_extra, body, w, h, comp=1):
    """Minimal hand-built little-endian TIFF with caller-supplied extra
    tag entries (each (tag, typ, cnt, payload_bytes) — payload appended
    after the IFD when > 4 bytes)."""
    bo = "<"
    base = [
        (256, 3, 1, struct.pack(bo + "HH", w, 0)),
        (257, 3, 1, struct.pack(bo + "HH", h, 0)),
        (258, 3, 1, struct.pack(bo + "HH", 8, 0)),
        (259, 3, 1, struct.pack(bo + "HH", comp, 0)),
        (277, 3, 1, struct.pack(bo + "HH", 1, 0)),
        (278, 3, 1, struct.pack(bo + "HH", h, 0)),
        (279, 4, 1, struct.pack(bo + "I", len(body))),
    ]
    inline = [(t, ty, c, p) for t, ty, c, p in entries_extra if len(p) <= 4]
    offsite = [(t, ty, c, p) for t, ty, c, p in entries_extra if len(p) > 4]
    n = len(base) + len(inline) + len(offsite) + 1  # +1 for StripOffsets
    ifd_size = 2 + 12 * n + 4
    pos = 8 + ifd_size
    rendered = []
    for t_, ty, c, p in offsite:
        rendered.append((t_, ty, c, struct.pack(bo + "I", pos)))
        pos += len(p)
    strip_off = pos
    all_entries = base + inline + rendered + [
        (273, 4, 1, struct.pack(bo + "I", strip_off))
    ]
    out = bytearray(b"II*\x00" + struct.pack(bo + "I", 8))
    out += struct.pack(bo + "H", n)
    for t_, ty, c, p in sorted(all_entries):
        out += struct.pack(bo + "HHI", t_, ty, c) + (p + b"\x00" * 4)[:4]
    out += struct.pack(bo + "I", 0)
    for _t, _ty, _c, p in offsite:
        out += p
    out += body
    return bytes(out)


def test_white_is_zero_inverts():
    px = bytes([0, 10, 128, 255, 7, 200])
    t = _build_tiff([(262, 3, 1, struct.pack("<HH", 0, 0))], px, 3, 2)
    assert decode_tiff(t) == (3, 2, 1, bytes(255 - v for v in px))


def test_palette_tiff_gray_and_rgb():
    # ColorMap: 16-bit planes R[256] G[256] B[256]; >>8 reduces to 8-bit
    idx = bytes([0, 1, 2, 1, 0, 2])
    gray_map = list(range(256)) * 3  # r==g==b after >>8? need 16-bit values
    cm = b"".join(
        struct.pack("<256H", *[v << 8 for v in range(256)]) for _ in range(3)
    )
    t = _build_tiff(
        [(262, 3, 1, struct.pack("<HH", 3, 0)), (320, 3, 768, cm)], idx, 3, 2
    )
    assert decode_tiff(t) == (3, 2, 1, idx)  # identity gray palette

    # a colored entry forces RGB expansion
    r = [v << 8 for v in range(256)]
    g = list(r)
    b = list(r)
    g[2] = 0  # entry 2 is not gray
    cm2 = (
        struct.pack("<256H", *r) + struct.pack("<256H", *g) + struct.pack("<256H", *b)
    )
    t2 = _build_tiff(
        [(262, 3, 1, struct.pack("<HH", 3, 0)), (320, 3, 768, cm2)], idx, 3, 2
    )
    w, h, ch, px = decode_tiff(t2)
    assert (w, h, ch) == (3, 2, 3)
    assert px[3 * 2 : 3 * 2 + 3] == bytes([2, 0, 2])  # the colored entry
    assert px[0:3] == bytes([0, 0, 0])

    # palette without a ColorMap is malformed
    t3 = _build_tiff([(262, 3, 1, struct.pack("<HH", 3, 0))], idx, 3, 2)
    with pytest.raises(ValueError, match="ColorMap"):
        decode_tiff(t3)


def test_tiled_tiff_all_compressions():
    """Hand-built tiled TIFFs (TIFF 6.0 s15): 2x2 tile grid with edge
    padding, per-tile compression, row-major tile order — assembled canvas
    must equal the raster image for none/PackBits/LZW(+predictor 2)."""
    from simsearch_spark.multimodal.tiff import (
        _diff_rows,
        lzw_encode_tiff,
        packbits,
    )

    bo = "<"
    w, h, tw, tl = 7, 5, 4, 4  # 2x2 tiles, right/bottom padding
    px = bytes((i * 29) & 0xFF for i in range(w * h))

    def tile_block(tx, ty):
        """Full tw x tl block with zero padding outside the image."""
        out = bytearray(tw * tl)
        for r in range(tl):
            y = ty * tl + r
            if y >= h:
                break
            for cidx in range(tw):
                x = tx * tw + cidx
                if x >= w:
                    break
                out[r * tw + cidx] = px[y * w + x]
        return bytes(out)

    for comp, pred, pack in (
        (1, 1, lambda t: t),
        (32773, 1, packbits),
        (5, 1, lzw_encode_tiff),
        (5, 2, lambda t: lzw_encode_tiff(_diff_rows(t, tw, tl, 1))),
    ):
        tiles = [pack(tile_block(tx, ty)) for ty in range(2) for tx in range(2)]
        n = 10
        ifd_size = 2 + 12 * n + 4
        arr_off = 8 + ifd_size
        data_off = arr_off + 8 * 4  # two LONG[4] arrays
        offs, pos = [], data_off
        for t in tiles:
            offs.append(pos)
            pos += len(t)
        entries = [
            (256, 3, 1, struct.pack(bo + "HH", w, 0)),
            (257, 3, 1, struct.pack(bo + "HH", h, 0)),
            (258, 3, 1, struct.pack(bo + "HH", 8, 0)),
            (259, 3, 1, struct.pack(bo + "HH", comp, 0)),
            (262, 3, 1, struct.pack(bo + "HH", 1, 0)),
            (277, 3, 1, struct.pack(bo + "HH", 1, 0)),
            (317, 3, 1, struct.pack(bo + "HH", pred, 0)),
            (322, 3, 1, struct.pack(bo + "HH", tw, 0)),
            (323, 3, 1, struct.pack(bo + "HH", tl, 0)),
            (324, 4, 4, struct.pack(bo + "I", arr_off)),
        ]
        # 325 replaces the 317 slot when pred==1? keep both: n=11 then
        entries.append((325, 4, 4, struct.pack(bo + "I", arr_off + 16)))
        n = len(entries)
        ifd_size = 2 + 12 * n + 4
        shift = (8 + ifd_size) - arr_off
        arr_off += shift
        data_off += shift
        offs = [o + shift for o in offs]
        entries[-2] = (324, 4, 4, struct.pack(bo + "I", arr_off))
        entries[-1] = (325, 4, 4, struct.pack(bo + "I", arr_off + 16))
        t = bytearray(b"II*\x00" + struct.pack(bo + "I", 8))
        t += struct.pack(bo + "H", n)
        for tag, typ, cnt, val in sorted(entries):
            t += struct.pack(bo + "HHI", tag, typ, cnt) + val
        t += struct.pack(bo + "I", 0)
        t += struct.pack(bo + "4I", *offs)
        t += struct.pack(bo + "4I", *[len(x) for x in tiles])
        for x in tiles:
            t += x
        assert decode_tiff(bytes(t)) == (w, h, 1, px), (comp, pred)


def test_planar_tiled_tiff_rgb():
    """Planar TILED TIFF (r12 — closes the planar×tiled seam): the tile
    arrays hold all plane-0 tiles row-major, then plane 1, then plane 2;
    each plane assembles like an independent gray tiled image (predictor
    spp=1 per tile row) and the planes interleave to chunky RGB — for
    every compression, with edge padding clipped."""
    import random

    from simsearch_spark.multimodal.tiff import (
        _diff_rows,
        lzw_encode_tiff,
        packbits,
    )

    bo = "<"
    w, h, tw, tl = 7, 5, 4, 4  # 2x2 tiles per plane, right/bottom padding
    rng = random.Random(31)
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    planes = [rgb[p::3] for p in range(3)]

    def tile_block(plane, tx, ty):
        out = bytearray(tw * tl)
        for r in range(tl):
            y = ty * tl + r
            if y >= h:
                break
            for cidx in range(tw):
                x = tx * tw + cidx
                if x >= w:
                    break
                out[r * tw + cidx] = plane[y * w + x]
        return bytes(out)

    for comp, pred, pack in (
        (1, 1, lambda t: t),
        (32773, 1, packbits),
        (5, 1, lzw_encode_tiff),
        (5, 2, lambda t: lzw_encode_tiff(_diff_rows(t, tw, tl, 1))),
    ):
        tiles = [
            pack(tile_block(pl, tx, ty))
            for pl in planes
            for ty in range(2)
            for tx in range(2)
        ]
        nt = len(tiles)  # 12 = 3 planes x 4 tiles
        entries = [
            (256, 3, 1, struct.pack(bo + "HH", w, 0)),
            (257, 3, 1, struct.pack(bo + "HH", h, 0)),
            (259, 3, 1, struct.pack(bo + "HH", comp, 0)),
            (262, 3, 1, struct.pack(bo + "HH", 2, 0)),
            (277, 3, 1, struct.pack(bo + "HH", 3, 0)),
            (284, 3, 1, struct.pack(bo + "HH", 2, 0)),
            (317, 3, 1, struct.pack(bo + "HH", pred, 0)),
            (322, 3, 1, struct.pack(bo + "HH", tw, 0)),
            (323, 3, 1, struct.pack(bo + "HH", tl, 0)),
        ]
        n = len(entries) + 3  # + 258(array) + 324 + 325
        ifd_size = 2 + 12 * n + 4
        bps_off = 8 + ifd_size
        arr_off = bps_off + 6
        data_off = arr_off + 8 * nt
        offs, pos = [], data_off
        for x in tiles:
            offs.append(pos)
            pos += len(x)
        entries.append((258, 3, 3, struct.pack(bo + "I", bps_off)))
        entries.append((324, 4, nt, struct.pack(bo + "I", arr_off)))
        entries.append((325, 4, nt, struct.pack(bo + "I", arr_off + 4 * nt)))
        t = bytearray(b"II*\x00" + struct.pack(bo + "I", 8))
        t += struct.pack(bo + "H", n)
        for tag, typ, cnt, val in sorted(entries):
            t += struct.pack(bo + "HHI", tag, typ, cnt) + val
        t += struct.pack(bo + "I", 0)
        t += struct.pack(bo + "HHH", 8, 8, 8)
        t += struct.pack(bo + f"{nt}I", *offs)
        t += struct.pack(bo + f"{nt}I", *[len(x) for x in tiles])
        for x in tiles:
            t += x
        assert decode_tiff(bytes(t)) == (w, h, 3, rgb), (comp, pred)

    # a tile count not divisible by the plane count is malformed
    bad_entries = [
        (256, 3, 1, struct.pack(bo + "HH", 4, 0)),
        (257, 3, 1, struct.pack(bo + "HH", 4, 0)),
        (258, 3, 1, struct.pack(bo + "HH", 8, 0)),
        (262, 3, 1, struct.pack(bo + "HH", 2, 0)),
        (277, 3, 1, struct.pack(bo + "HH", 3, 0)),
        (284, 3, 1, struct.pack(bo + "HH", 2, 0)),
        (322, 3, 1, struct.pack(bo + "HH", 4, 0)),
        (323, 3, 1, struct.pack(bo + "HH", 4, 0)),
        (324, 4, 1, struct.pack(bo + "I", 200)),
        (325, 4, 1, struct.pack(bo + "I", 16)),
    ]
    t = bytearray(b"II*\x00" + struct.pack(bo + "I", 8))
    t += struct.pack(bo + "H", len(bad_entries))
    for tag, typ, cnt, val in sorted(bad_entries):
        t += struct.pack(bo + "HHI", tag, typ, cnt) + val
    t += struct.pack(bo + "I", 0)
    t += bytes(300)
    with pytest.raises(ValueError, match="not divisible"):
        decode_tiff(bytes(t))


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split one complete JPEG stream into the TIFF/EP pair: an
    abbreviated-TABLES stream (SOI, every DQT/DHT, EOI — the tag-347
    payload) and an abbreviated-IMAGE stream (SOI, everything else).
    Inverse of ``tiff._merge_jpegtables`` up to segment order, which a
    sequential JPEG parser is insensitive to."""
    assert stream[:2] == b"\xff\xd8"
    tables = bytearray(b"\xff\xd8")
    image = bytearray(b"\xff\xd8")
    pos = 2
    while pos < len(stream):
        assert stream[pos] == 0xFF
        m = stream[pos + 1]
        if m == 0xDA:  # SOS: header + entropy + EOI all stay image-side
            image += stream[pos:]
            break
        (ln,) = struct.unpack(">H", stream[pos + 2 : pos + 4])
        seg = stream[pos : pos + 2 + ln]
        (tables if m in (0xDB, 0xC4) else image).__iadd__(seg)
        pos += 2 + ln
    tables += b"\xff\xd9"
    return bytes(tables), bytes(image)


def _build_jpeg_tiff(w, h, rps, strips, tables=None):
    """Minimal compression-7 TIFF: gray, little-endian, optional tag-347
    JPEGTables payload appended after the strip data."""
    bo = "<"
    entries = [
        (256, 3, 1, struct.pack(bo + "HH", w, 0)),
        (257, 3, 1, struct.pack(bo + "HH", h, 0)),
        (258, 3, 1, struct.pack(bo + "HH", 8, 0)),
        (259, 3, 1, struct.pack(bo + "HH", 7, 0)),
        (262, 3, 1, struct.pack(bo + "HH", 1, 0)),
        (277, 3, 1, struct.pack(bo + "HH", 1, 0)),
        (278, 3, 1, struct.pack(bo + "HH", rps, 0)),
    ]
    multi = len(strips) > 1
    n = len(entries) + 2 + (1 if tables is not None else 0)
    arr = 8 + 2 + 12 * n + 4
    data_off = arr + (8 * len(strips) if multi else 0)
    offs, pos = [], data_off
    for s_ in strips:
        offs.append(pos)
        pos += len(s_)
    if multi:
        entries.append((273, 4, len(strips), struct.pack(bo + "I", arr)))
        entries.append(
            (279, 4, len(strips), struct.pack(bo + "I", arr + 4 * len(strips)))
        )
    else:
        entries.append((273, 4, 1, struct.pack(bo + "I", offs[0])))
        entries.append((279, 4, 1, struct.pack(bo + "I", len(strips[0]))))
    if tables is not None:
        if len(tables) <= 4:
            entries.append((347, 7, len(tables), tables.ljust(4, b"\x00")))
        else:
            entries.append((347, 7, len(tables), struct.pack(bo + "I", pos)))
    t = bytearray(b"II*\x00" + struct.pack(bo + "I", 8))
    t += struct.pack(bo + "H", n)
    for tag, typ, cnt, val in sorted(entries):
        t += struct.pack(bo + "HHI", tag, typ, cnt) + val
    t += struct.pack(bo + "I", 0)
    if multi:
        t += struct.pack(bo + f"{len(strips)}I", *offs)
        t += struct.pack(bo + f"{len(strips)}I", *[len(s_) for s_ in strips])
    for s_ in strips:
        t += s_
    if tables is not None and len(tables) > 4:
        t += tables
    return bytes(t)


def test_jpeg_in_tiff_strips():
    """New-style JPEG-in-TIFF (compression 7): strips are self-contained
    JPEG streams decoded by the in-repo codec.  Uniform strips decode
    exactly at q85 (the block-constant exactness property), so the whole
    container round-trips bit-for-bit; geometry disagreement between
    strip and IFD is a ValueError."""
    from simsearch_spark.multimodal.jpeg import encode_jpeg

    w, h = 16, 16
    top = bytes([40] * (w * 8))
    bottom = bytes([200] * (w * 8))
    two = _build_jpeg_tiff(
        w, h, 8,
        [encode_jpeg(w, 8, 1, top, quality=85), encode_jpeg(w, 8, 1, bottom, quality=85)],
    )
    assert decode_tiff(two) == (w, h, 1, top + bottom)

    # strip/IFD geometry disagreement
    bad = _build_jpeg_tiff(w, 8, 8, [encode_jpeg(8, 8, 1, bytes([40] * 64), quality=85)])
    with pytest.raises(ValueError, match="geometry"):
        decode_tiff(bad)


def test_jpeg_in_tiff_jpegtables():
    """JPEGTables form (TIFF/EP tag 347, r12): the shared abbreviated
    tables stream splices into each strip's abbreviated image stream and
    decodes EXACTLY like the self-contained form.  A malformed tables
    payload (no SOI/EOI) is a ValueError, and a tables stream with
    trailing zero padding is accepted (writers pad)."""
    from simsearch_spark.multimodal.jpeg import encode_jpeg

    w, h = 16, 16
    top = bytes([40] * (w * 8))
    bottom = bytes([200] * (w * 8))
    s1, s2 = encode_jpeg(w, 8, 1, top, quality=85), encode_jpeg(w, 8, 1, bottom, quality=85)
    t1, i1 = _split_jpeg_tables(s1)
    t2, i2 = _split_jpeg_tables(s2)
    assert t1 == t2  # same quality → same DQT/DHT, the form's whole point
    assert len(i1) < len(s1)  # the split actually moved segments out

    abbrev = _build_jpeg_tiff(w, h, 8, [i1, i2], tables=t1)
    full = _build_jpeg_tiff(w, h, 8, [s1, s2])
    assert decode_tiff(abbrev) == decode_tiff(full) == (w, h, 1, top + bottom)

    # padded tables accepted
    padded = _build_jpeg_tiff(w, h, 8, [i1, i2], tables=t1 + b"\x00\x00")
    assert decode_tiff(padded) == (w, h, 1, top + bottom)

    # malformed tables payload
    with pytest.raises(ValueError, match="SOI"):
        decode_tiff(_build_jpeg_tiff(w, 8, 8, [i1], tables=b"\xff\xd8\x00\x00"))


def test_jpeg_in_tiff_tiled():
    """Tiled JPEG-in-TIFF (r12, closes the r11 ADVICE hole where JPEG
    tiles fell into the raw path): each tile is a complete — or
    JPEGTables-abbreviated — JPEG stream of the FULL tile geometry;
    uniform tiles decode exactly at q85.  A tile whose JPEG geometry
    disagrees with the tile contract is a ValueError, never garbage
    pixels reported as ok."""
    from simsearch_spark.multimodal.jpeg import encode_jpeg

    bo = "<"
    w = h = 32
    tw = tl = 16
    vals = [40, 90, 160, 220]
    tiles_px = [bytes([v] * (tw * tl)) for v in vals]
    want = bytearray(w * h)
    for ti, px in enumerate(tiles_px):
        ty, tx = divmod(ti, 2)
        for r in range(tl):
            dst = (ty * tl + r) * w + tx * tw
            want[dst : dst + tw] = px[r * tw : (r + 1) * tw]

    def build_tiled(tiles, tables=None):
        entries = [
            (256, 3, 1, struct.pack(bo + "HH", w, 0)),
            (257, 3, 1, struct.pack(bo + "HH", h, 0)),
            (258, 3, 1, struct.pack(bo + "HH", 8, 0)),
            (259, 3, 1, struct.pack(bo + "HH", 7, 0)),
            (262, 3, 1, struct.pack(bo + "HH", 1, 0)),
            (277, 3, 1, struct.pack(bo + "HH", 1, 0)),
            (322, 3, 1, struct.pack(bo + "HH", tw, 0)),
            (323, 3, 1, struct.pack(bo + "HH", tl, 0)),
        ]
        n = len(entries) + 2 + (1 if tables is not None else 0)
        arr = 8 + 2 + 12 * n + 4
        data_off = arr + 8 * len(tiles)
        offs, pos = [], data_off
        for x in tiles:
            offs.append(pos)
            pos += len(x)
        entries.append((324, 4, len(tiles), struct.pack(bo + "I", arr)))
        entries.append((325, 4, len(tiles), struct.pack(bo + "I", arr + 4 * len(tiles))))
        if tables is not None:
            entries.append((347, 7, len(tables), struct.pack(bo + "I", pos)))
        t = bytearray(b"II*\x00" + struct.pack(bo + "I", 8))
        t += struct.pack(bo + "H", n)
        for tag, typ, cnt, val in sorted(entries):
            t += struct.pack(bo + "HHI", tag, typ, cnt) + val
        t += struct.pack(bo + "I", 0)
        t += struct.pack(bo + f"{len(tiles)}I", *offs)
        t += struct.pack(bo + f"{len(tiles)}I", *[len(x) for x in tiles])
        for x in tiles:
            t += x
        if tables is not None:
            t += tables
        return bytes(t)

    streams = [encode_jpeg(tw, tl, 1, px, quality=85) for px in tiles_px]
    assert decode_tiff(build_tiled(streams)) == (w, h, 1, bytes(want))

    # JPEGTables-abbreviated tiles decode identically
    pairs = [_split_jpeg_tables(s_) for s_ in streams]
    assert len({p[0] for p in pairs}) == 1
    abbrev = build_tiled([p[1] for p in pairs], tables=pairs[0][0])
    assert decode_tiff(abbrev) == (w, h, 1, bytes(want))

    # wrong-geometry tile: explicit error, not raw-path garbage
    bad = [encode_jpeg(8, 8, 1, bytes([40] * 64), quality=85)] + streams[1:]
    with pytest.raises(ValueError, match="tile"):
        decode_tiff(build_tiled(bad))


def test_multipage_tiff():
    """Multi-page TIFF (r12): the IFD chain decodes per page — every page
    round-trips under its own geometry/compression, ``tiff_page_count``
    walks the chain, page-out-of-range is a ValueError, and a circular
    chain is loop-guarded."""
    import random

    from simsearch_spark.multimodal.tiff import (
        encode_tiff_multipage,
        tiff_page_count,
    )

    rng = random.Random(7)
    pages = [
        (9, 4, 1, bytes(rng.randrange(256) for _ in range(9 * 4))),
        (5, 7, 3, bytes(rng.randrange(256) for _ in range(5 * 7 * 3))),
        (16, 2, 1, bytes(rng.randrange(256) for _ in range(16 * 2))),
    ]
    for comp, pred in [(None, 1), ("packbits", 1), ("lzw", 1), ("lzw", 2)]:
        blob = encode_tiff_multipage(pages, compression=comp, predictor=pred)
        assert tiff_page_count(blob) == 3, (comp, pred)
        for i, (w, h, c, px) in enumerate(pages):
            assert decode_tiff(blob, page=i) == (w, h, c, px), (comp, pred, i)
        # page 0 is the single-page default — existing callers unchanged
        assert decode_tiff(blob) == decode_tiff(blob, page=0)
        with pytest.raises(ValueError, match="page"):
            decode_tiff(blob, page=3)

    # big-endian chain walks too
    blob_be = encode_tiff_multipage(pages, big_endian=True)
    assert tiff_page_count(blob_be) == 3
    assert decode_tiff(blob_be, page=2) == pages[2]

    # circular chain: patch page-0's next-IFD pointer back to itself
    blob = bytearray(encode_tiff_multipage(pages[:2]))
    n_entries = 9
    ptr = 8 + 2 + 12 * n_entries
    struct.pack_into("<I", blob, ptr, 8)
    with pytest.raises(ValueError, match="loop"):
        tiff_page_count(bytes(blob))


def test_planar_tiff_rgb_all_compressions():
    """PlanarConfiguration 2 (r11): per-plane strip runs (R strips, then
    G, then B), each plane decoding like an independent gray image
    (predictor spp=1), interleaved to chunky RGB — for every compression
    and a 2-strips-per-plane split."""
    from simsearch_spark.multimodal.tiff import (
        _diff_rows,
        lzw_encode_tiff,
        packbits,
    )

    bo = "<"
    w, h, rps = 5, 4, 2  # 2 strips per plane
    px = bytes((i * 23) & 0xFF for i in range(w * h * 3))
    planes = [px[c::3] for c in range(3)]

    for comp, pred, pack in (
        (1, 1, lambda t: t),
        (32773, 1, packbits),
        (5, 1, lzw_encode_tiff),
        (5, 2, lambda t: lzw_encode_tiff(_diff_rows(t, w, 2, 1))),
    ):
        strips = [
            pack(pl[s * rps * w : (s + 1) * rps * w])
            for pl in planes
            for s in range(2)
        ]
        n = 11
        ifd = 2 + 12 * n + 4
        arr = 8 + ifd
        data_off = arr + 2 * 4 * len(strips)
        offs, pos = [], data_off
        for s_ in strips:
            offs.append(pos)
            pos += len(s_)
        entries = [
            (256, 3, 1, struct.pack(bo + "HH", w, 0)),
            (257, 3, 1, struct.pack(bo + "HH", h, 0)),
            (258, 3, 3, struct.pack(bo + "I", 0)),  # placeholder; fix below
            (259, 3, 1, struct.pack(bo + "HH", comp, 0)),
            (262, 3, 1, struct.pack(bo + "HH", 2, 0)),
            (273, 4, len(strips), struct.pack(bo + "I", arr)),
            (277, 3, 1, struct.pack(bo + "HH", 3, 0)),
            (278, 3, 1, struct.pack(bo + "HH", rps, 0)),
            (279, 4, len(strips), struct.pack(bo + "I", arr + 4 * len(strips))),
            (284, 3, 1, struct.pack(bo + "HH", 2, 0)),
            (317, 3, 1, struct.pack(bo + "HH", pred, 0)),
        ]
        # bits-per-sample [8,8,8] needs an offsite array: append after data
        bps_off = pos
        entries[2] = (258, 3, 3, struct.pack(bo + "I", bps_off))
        t = bytearray(b"II*\x00" + struct.pack(bo + "I", 8))
        t += struct.pack(bo + "H", n)
        for tag, typ, cnt, val in sorted(entries):
            t += struct.pack(bo + "HHI", tag, typ, cnt) + val
        t += struct.pack(bo + "I", 0)
        t += struct.pack(bo + f"{len(strips)}I", *offs)
        t += struct.pack(bo + f"{len(strips)}I", *[len(s_) for s_ in strips])
        for s_ in strips:
            t += s_
        t += struct.pack(bo + "HHH", 8, 8, 8)
        assert decode_tiff(bytes(t)) == (w, h, 3, px), (comp, pred)


def test_bit_depths_1_4_16():
    """r12: non-8-bit sample depths on the strip path — 16-bit gray is
    the exact v*257 widening (both byte orders, every compression),
    1/4-bit pack MSB-first with byte-aligned rows and bit-replicate."""
    import random

    from simsearch_spark.multimodal.binary import decode_image
    from simsearch_spark.multimodal.tiff import encode_tiff

    rng = random.Random(21)
    for w, h in [(1, 1), (7, 3), (16, 2), (9, 5)]:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        for be in (False, True):
            for comp in (None, "lzw", "packbits"):
                blob = encode_tiff(
                    w, h, 1, px, big_endian=be, compression=comp,
                    bits_per_sample=16,
                )
                assert decode_tiff(blob) == (w, h, 1, px), (w, h, be, comp)
                assert decode_image(blob) == (w, h, 1, px)
        # 1-bit: values from {0, 255}; 4-bit: multiples of 17
        p1 = bytes(rng.choice([0, 255]) for _ in range(w * h))
        p4 = bytes(rng.randrange(16) * 17 for _ in range(w * h))
        for bps, px_n in [(1, p1), (4, p4)]:
            for comp in (None, "lzw", "packbits"):
                blob = encode_tiff(w, h, 1, px_n, compression=comp,
                                   bits_per_sample=bps)
                assert decode_tiff(blob) == (w, h, 1, px_n), (w, h, bps, comp)

    # WhiteIsZero bilevel (the fax convention): inversion after scaling
    blob = bytearray(encode_tiff(4, 1, 1, bytes([0, 255, 255, 0]),
                                 bits_per_sample=1))
    i = blob.index(struct.pack("<HHI", 262, 3, 1))
    blob[i + 8] = 0  # photometric 1 -> 0
    assert decode_tiff(bytes(blob)) == (4, 1, 1, bytes([255, 0, 0, 255]))

    # 4-bit PALETTE: ColorMap is 3x16, indices stay unscaled
    base = bytearray(encode_tiff(3, 1, 1, bytes([0, 17 * 5, 17 * 15]),
                                 bits_per_sample=4))
    i = base.index(struct.pack("<HHI", 262, 3, 1))
    base[i + 8] = 3  # photometric palette
    cmap = [(v * 4369) for v in range(16)] * 3  # gray ramp, 16-bit entries
    cmap_bytes = struct.pack("<48H", *cmap)
    # append the ColorMap and a tag pointing at it: rebuild via raw IFD
    # surgery is brittle -- instead decode expects 3x16; craft by hand
    from simsearch_spark.multimodal.tiff import decode_tiff as dt

    n_entries = struct.unpack("<H", base[8:10])[0]
    ifd_end = 10 + 12 * n_entries
    new = bytearray(base[:ifd_end])
    cmap_off = len(base) + 12  # after the grown IFD + next-IFD ptr shift
    # grow entry count, insert tag 320 (sorted: 320 > 279, < 322)
    struct.pack_into("<H", new, 8, n_entries + 1)
    entry = struct.pack("<HHII", 320, 3, 48, cmap_off)
    # find insert position: after the last tag <= 320
    pos = 10
    while pos < ifd_end:
        t = struct.unpack("<H", new[pos : pos + 2])[0]
        if t > 320:
            break
        pos += 12
    new = new[:pos] + entry + new[pos:ifd_end]
    rest = bytearray(base[ifd_end:])
    # strip offset tag moved by +12: fix tag 273's value
    blob2 = bytes(new) + bytes(rest) + cmap_bytes
    blob2 = bytearray(blob2)
    pos = 10
    for _ in range(n_entries + 1):
        t, typ, cnt = struct.unpack("<HHI", blob2[pos : pos + 8])
        if t == 273:
            (old,) = struct.unpack("<I", blob2[pos + 8 : pos + 12])
            struct.pack_into("<I", blob2, pos + 8, old + 12)
        pos += 12
    got = dt(bytes(blob2))
    assert got == (3, 1, 1, bytes([0, 85, 255]))  # 4369*v >> 8 == 17*v

    # seams and malformed cases
    with pytest.raises(ValueError, match="multiples of 17"):
        encode_tiff(2, 1, 1, bytes([1, 2]), bits_per_sample=4)
    with pytest.raises(ValueError, match="single-channel"):
        encode_tiff(1, 1, 3, bytes(3), bits_per_sample=16)
    b = bytearray(encode_tiff(4, 2, 1, bytes(8)))
    i = b.index(struct.pack("<HHI", 258, 3, 1))
    struct.pack_into("<H", b, i + 8, 2)  # bps 2: still a seam
    with pytest.raises(NotImplementedError, match="bits-per-sample 2"):
        decode_tiff(bytes(b))
    struct.pack_into("<H", b, i + 8, 16)  # 16-bit but data too short
    with pytest.raises(ValueError, match="strips hold"):
        decode_tiff(bytes(b))


def test_sixteen_bit_palette_is_malformed():
    """r13 PERMANENT pin: TIFF 6.0 §5 limits palette images to 4/8-bit
    samples, so a 16-bit photometric-3 file is malformed input
    (ValueError), not a capability seam — high-byte reduction would look
    up the wrong palette entries while labeling the result 'ok'."""
    b = bytearray(encode_tiff(2, 1, 1, bytes([0, 17]), bits_per_sample=16))
    i = b.index(struct.pack("<HHI", 262, 3, 1))
    b[i + 8] = 3  # photometric: palette
    with pytest.raises(ValueError, match="16-bit palette"):
        decode_tiff(bytes(b))


def test_sixteen_bit_predictor2():
    """r12: predictor 2 at 16 bits differences in SAMPLE space (mod
    65536, file byte order) under LZW — exact round trip both orders."""
    import random

    rng = random.Random(41)
    for w, h in [(1, 1), (7, 3), (16, 2)]:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        for be in (False, True):
            blob = encode_tiff(
                w, h, 1, px, big_endian=be, compression="lzw",
                predictor=2, bits_per_sample=16,
            )
            assert decode_tiff(blob) == (w, h, 1, px), (w, h, be)
    # sub-byte differencing stays the seam
    b = bytearray(encode_tiff(4, 1, 1, bytes([0, 255, 0, 255]),
                              compression="lzw", bits_per_sample=1))
    # splice a predictor-2 tag (317) is fiddly; assert the encoder gate
    with pytest.raises(ValueError, match="8 or 16 bits"):
        encode_tiff(4, 1, 1, bytes([0, 255, 0, 255]), compression="lzw",
                    predictor=2, bits_per_sample=1)


def _build_tiled_gray(w, h, tw, tl, bps, tiles, comp=1, bo="<"):
    """Hand-built single-plane tiled TIFF at arbitrary bit depth."""
    entries = [
        (256, 3, 1, struct.pack(bo + "HH", w, 0)),
        (257, 3, 1, struct.pack(bo + "HH", h, 0)),
        (258, 3, 1, struct.pack(bo + "HH", bps, 0)),
        (259, 3, 1, struct.pack(bo + "HH", comp, 0)),
        (262, 3, 1, struct.pack(bo + "HH", 1, 0)),
        (277, 3, 1, struct.pack(bo + "HH", 1, 0)),
        (322, 3, 1, struct.pack(bo + "HH", tw, 0)),
        (323, 3, 1, struct.pack(bo + "HH", tl, 0)),
    ]
    nt = len(tiles)
    n = len(entries) + 2
    ifd_size = 2 + 12 * n + 4
    arr_off = 8 + ifd_size
    data_off = arr_off + 8 * nt
    offs, pos = [], data_off
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    entries.append((324, 4, nt, struct.pack(bo + "I", arr_off)))
    entries.append((325, 4, nt, struct.pack(bo + "I", arr_off + 4 * nt)))
    out = bytearray((b"II*\x00" if bo == "<" else b"MM\x00*")
                    + struct.pack(bo + "I", 8))
    out += struct.pack(bo + "H", n)
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val
    out += struct.pack(bo + "I", 0)
    out += struct.pack(bo + f"{nt}I", *offs)
    out += struct.pack(bo + f"{nt}I", *[len(t) for t in tiles])
    for t in tiles:
        out += t
    return bytes(out)


def test_tiled_sub_byte_and_16bit():
    """r13 (closes the tiled-depth seam): 1/4-bit and 16-bit single-plane
    TILED gray assemble by byte-aligned blit (spec tile widths are
    multiples of 16, so sub-byte tile boundaries land on bytes) — edge
    padding clipped, uncompressed and LZW, both byte orders for 16."""
    import random

    rng = random.Random(53)
    from simsearch_spark.multimodal.tiff import lzw_encode_tiff

    for bps, tw, tl in [(1, 16, 4), (4, 16, 2)]:
        w, h = 21, 5  # 2x? grid with right/bottom padding
        mul = 255 // ((1 << bps) - 1)
        px = bytes(rng.randrange(1 << bps) * mul for _ in range(w * h))
        t_stride = tw * bps // 8
        across, down = -(-w // tw), -(-h // tl)
        tiles = []
        for ty in range(down):
            for tx in range(across):
                block = bytearray(t_stride * tl)
                for r in range(tl):
                    y = ty * tl + r
                    if y >= h:
                        break
                    for cidx in range(tw):
                        x = tx * tw + cidx
                        if x >= w:
                            break
                        v = px[y * w + x] // mul
                        if bps == 4:
                            block[r * t_stride + (cidx >> 1)] |= (
                                v << (0 if cidx & 1 else 4)
                            )
                        else:
                            block[r * t_stride + (cidx >> 3)] |= (
                                v << (7 - (cidx & 7))
                            )
                tiles.append(bytes(block))
        blob = _build_tiled_gray(w, h, tw, tl, bps, tiles)
        assert decode_tiff(blob) == (w, h, 1, px), bps
        lzw_tiles = [lzw_encode_tiff(t) for t in tiles]
        blob5 = _build_tiled_gray(w, h, tw, tl, bps, lzw_tiles, comp=5)
        assert decode_tiff(blob5) == (w, h, 1, px), ("lzw", bps)

    # 16-bit tiled: v*257 widening, both byte orders
    for bo in ("<", ">"):
        w, h, tw, tl = 20, 3, 16, 2
        px = bytes(rng.randrange(256) for _ in range(w * h))
        tiles = []
        for ty in range(-(-h // tl)):
            for tx in range(-(-w // tw)):
                block = bytearray(tw * tl * 2)
                for r in range(tl):
                    y = ty * tl + r
                    if y >= h:
                        break
                    for cidx in range(tw):
                        x = tx * tw + cidx
                        if x >= w:
                            break
                        struct.pack_into(
                            bo + "H", block, (r * tw + cidx) * 2,
                            px[y * w + x] * 257,
                        )
                tiles.append(bytes(block))
        blob = _build_tiled_gray(w, h, tw, tl, 16, tiles, bo=bo)
        assert decode_tiff(blob) == (w, h, 1, px), bo

    # non-byte-aligned sub-byte tile width stays a named seam
    bad = _build_tiled_gray(4, 2, 4, 2, 1, [bytes(2)])
    with pytest.raises(NotImplementedError, match="tile width"):
        decode_tiff(bad)


def test_planar_single_sample_normalizes():
    """r13: PlanarConfiguration 2 with SamplesPerPixel 1 is a no-op per
    TIFF 6.0 ('irrelevant if SamplesPerPixel is 1') — decode, don't
    seam."""
    b = bytearray(encode_tiff(4, 2, 1, bytes([0, 17, 34, 51] * 2),
                              bits_per_sample=4))
    # splice planar=2 by repurposing the RowsPerStrip tag slot
    i = b.index(struct.pack("<HHI", 278, 3, 1))
    b[i:i + 12] = struct.pack("<HHI", 284, 3, 1) + struct.pack("<HH", 2, 0)
    assert decode_tiff(bytes(b)) == (4, 2, 1, bytes([0, 17, 34, 51] * 2))


def test_sub_byte_predictor_is_malformed():
    """r13 PERMANENT pin: predictor 2 below 8 bits has no spec meaning
    (TIFF 6.0 §14 defines differencing for 8-bit; the TechNote covers
    16/32) — malformed input, not a seam."""
    b = bytearray(encode_tiff(8, 1, 1, bytes([0, 255] * 4),
                              compression="lzw", bits_per_sample=1))
    i = b.index(struct.pack("<HHI", 278, 3, 1))
    b[i:i + 12] = struct.pack("<HHI", 317, 3, 1) + struct.pack("<HH", 2, 0)
    with pytest.raises(ValueError, match="not defined by"):
        decode_tiff(bytes(b))


def test_deflate_compression():
    """r13 (TIFF TechNote 2): Deflate strips (tag 8) via stdlib zlib —
    every depth, predictor 2 at 8/16 bits, both byte orders, RGB,
    multi-strip, tiled, the legacy 32946 alias, and malformed streams."""
    import zlib as _zlib

    rng = random.Random(61)
    for bps in (1, 4, 8, 16):
        mul = 255 // ((1 << bps) - 1) if bps in (1, 4) else 1
        w, h = 19, 4
        px = bytes(
            (rng.randrange(1 << bps) * mul) if bps in (1, 4)
            else rng.randrange(256)
            for _ in range(w * h)
        )
        for be in (False, True):
            blob = encode_tiff(w, h, 1, px, big_endian=be,
                               compression="deflate", bits_per_sample=bps)
            assert decode_tiff(blob) == (w, h, 1, px), (bps, be)
    # predictor 2 under Deflate, 8- and 16-bit
    for bps in (8, 16):
        px = bytes(rng.randrange(256) for _ in range(15 * 3))
        blob = encode_tiff(15, 3, 1, px, compression="deflate",
                           predictor=2, bits_per_sample=bps)
        assert decode_tiff(blob) == (15, 3, 1, px), bps
    # RGB
    px3 = bytes(rng.randrange(256) for _ in range(6 * 2 * 3))
    assert decode_tiff(encode_tiff(6, 2, 3, px3, compression="deflate")) \
        == (6, 2, 3, px3)
    # legacy tag 32946 decodes identically
    blob = bytearray(encode_tiff(4, 2, 1, bytes(8), compression="deflate"))
    i = blob.index(struct.pack("<HHI", 259, 3, 1))
    blob[i + 8 : i + 12] = struct.pack("<HH", 32946 & 0xFFFF, 0)
    assert decode_tiff(bytes(blob)) == (4, 2, 1, bytes(8))
    # tiled Deflate at 1-bit through the shared tile path
    from simsearch_spark.multimodal.tiff import lzw_encode_tiff  # noqa: F401

    w, h, tw, tl = 21, 3, 16, 2
    px = bytes(rng.choice((0, 255)) for _ in range(w * h))
    t_stride = tw // 8
    tiles = []
    for ty in range(-(-h // tl)):
        for tx in range(-(-w // tw)):
            block = bytearray(t_stride * tl)
            for r in range(tl):
                y = ty * tl + r
                if y >= h:
                    break
                for cidx in range(tw):
                    x = tx * tw + cidx
                    if x >= w:
                        break
                    if px[y * w + x] == 0:
                        pass
                    else:
                        block[r * t_stride + (cidx >> 3)] |= 0x80 >> (cidx & 7)
            tiles.append(_zlib.compress(bytes(block)))
    # NOTE: white-on-255 convention — bit 1 = 255 under BlackIsZero
    blob = _build_tiled_gray(w, h, tw, tl, 1, tiles, comp=8)
    assert decode_tiff(blob) == (w, h, 1, px)
    # malformed zlib stream
    bad = bytearray(encode_tiff(4, 2, 1, bytes(8), compression="deflate"))
    bad[-3] ^= 0xFF
    with pytest.raises(ValueError, match="Deflate"):
        decode_tiff(bytes(bad))


def test_ccitt_tiled_g4_and_mh():
    """r14 (closes the CCITT-tiles seam): every tile is an independent
    T.4/T.6 coding block of the FULL tile geometry — G4's reference line
    resets per tile, edge padding clips at the blit, and MH tiles decode
    through the same per-tile dispatch."""
    from simsearch_spark.multimodal.ccitt import (
        ccitt_encode_g3_1d,
        ccitt_encode_g4,
        rows_to_bits,
    )

    rng = random.Random(91)
    w, h, tw, tl = 21, 5, 16, 4  # 2x2 tile grid with right/bottom padding
    px = bytes(255 if rng.random() < 0.6 else 0 for _ in range(w * h))
    across, down = -(-w // tw), -(-h // tl)

    for comp, enc in ((4, ccitt_encode_g4), (2, ccitt_encode_g3_1d)):
        tiles = []
        for ty in range(down):
            for tx in range(across):
                block = bytearray([255] * (tw * tl))  # spec padding: white
                for r in range(min(tl, h - ty * tl)):
                    for c in range(min(tw, w - tx * tw)):
                        block[r * tw + c] = px[(ty * tl + r) * w + tx * tw + c]
                lines = rows_to_bits(bytes(block), tw, tl)
                tiles.append(
                    enc(lines, tw) if comp == 4 else enc(lines, tw)
                )
        blob = _build_tiled_gray(w, h, tw, tl, 1, tiles, comp=comp)
        gw, gh, gch, gpx = decode_tiff(blob)
        assert (gw, gh, gch) == (w, h, 1)
        assert gpx == px, f"compression {comp} tile mismatch"


def test_ccitt_tiled_g3_eol():
    """Compression 3 tiles: each tile is an EOL-delimited G3 stream."""
    from simsearch_spark.multimodal.ccitt import ccitt_encode_g3_eol, rows_to_bits

    w, h, tw, tl = 16, 6, 16, 4  # 1x2 grid, bottom padding
    px = bytes(0 if (x // 4 + y) % 2 else 255 for y in range(h) for x in range(w))
    tiles = []
    for ty in range(-(-h // tl)):
        block = bytearray([255] * (tw * tl))
        for r in range(min(tl, h - ty * tl)):
            block[r * tw : r * tw + tw] = px[(ty * tl + r) * w : (ty * tl + r + 1) * w]
        tiles.append(ccitt_encode_g3_eol(rows_to_bits(bytes(block), tw, tl), tw))
    blob = _build_tiled_gray(w, h, tw, tl, 1, tiles, comp=3)
    gw, gh, gch, gpx = decode_tiff(blob)
    assert (gw, gh, gch) == (w, h, 1)
    assert gpx == px
