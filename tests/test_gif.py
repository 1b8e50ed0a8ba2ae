"""Tests for the from-scratch GIF codec (multimodal/gif.py): round-trips,
LZW dictionary behavior, container seams, and the media-query routing."""

import random
import struct

import pytest

from simsearch_spark.multimodal.gif import decode_gif, encode_gif, parse_gif_header


def test_grayscale_roundtrips_across_shapes_and_palettes():
    rng = random.Random(1)
    for w, h, ncol in [(1, 1, 1), (4, 4, 2), (31, 7, 16), (64, 64, 256), (200, 3, 250)]:
        vals = [rng.randrange(256) for _ in range(ncol)]
        px = bytes(rng.choice(vals) for _ in range(w * h))
        g = encode_gif(w, h, 1, px)
        assert parse_gif_header(g) == (w, h)
        assert decode_gif(g) == (w, h, 1, px), (w, h, ncol)


def test_rgb_roundtrip_and_gray_palette_collapse():
    rng = random.Random(2)
    pool = [bytes(rng.randrange(256) for _ in range(3)) for _ in range(100)]
    pix = b"".join(pool[rng.randrange(100)] for _ in range(16 * 16))
    assert decode_gif(encode_gif(16, 16, 3, pix)) == (16, 16, 3, pix)
    # an RGB image whose referenced palette is all-gray decodes to 1 channel
    gray = b"".join(bytes([v, v, v]) for v in [10, 200] * 32)
    assert decode_gif(encode_gif(8, 8, 3, gray)) == (8, 8, 1, bytes([10, 200] * 32))


def test_lzw_dictionary_reset_at_4096():
    """A high-entropy image forces > 4096 dictionary entries: the encoder
    must emit CLEAR and reset, and the decoder must follow."""
    rng = random.Random(3)
    px = bytes(rng.randrange(256) for _ in range(120 * 120))  # ~14k codes
    assert decode_gif(encode_gif(120, 120, 1, px)) == (120, 120, 1, px)


def test_long_runs_grow_code_width():
    """Constant runs build maximal match lengths — the width-growth
    schedule (encoder and decoder must agree code-for-code)."""
    px = bytes((1 if (i // 300) % 2 else 0) * 255 for i in range(300 * 300))
    assert decode_gif(encode_gif(300, 300, 1, px)) == (300, 300, 1, px)


def test_palette_overflow_and_bad_buffer_raise():
    # 300 distinct RGB colors > the 256-entry table
    over = b"".join(bytes([i % 256, i // 256, 0]) for i in range(300)) + b"\x00\x00\x00" * 84
    with pytest.raises(ValueError, match="quantizer"):
        encode_gif(24, 16, 3, over)
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_gif(4, 4, 1, b"\x00" * 15)
    with pytest.raises(ValueError, match="1 or 3 channels"):
        encode_gif(4, 4, 2, b"\x00" * 32)
    with pytest.raises(ValueError, match="not a GIF"):
        parse_gif_header(b"\x89PNG\r\n\x1a\nxxxxxxxx")


def _patch_image_packed(g: bytes, or_bits: int) -> bytes:
    """Set bits in the image descriptor's packed field (byte after the
    9-byte descriptor header start)."""
    b = bytearray(g)
    pos = b.index(b"\x2c")  # encoder emits image descriptor once
    b[pos + 9] |= or_bits
    return bytes(b)


def test_animation_is_a_named_seam_and_interlace_flag_reorders():
    g = encode_gif(4, 4, 1, bytes(range(16)))
    # r11: interlace is implemented — flipping the flag on raster-order
    # data decodes (a row PERMUTATION, since the stream wasn't written in
    # pass order); the proper write-side round-trip is
    # test_interlaced_gif_roundtrip
    w, h, ch, px = decode_gif(_patch_image_packed(g, 0x40))
    assert (w, h, ch) == (4, 4, 1) and sorted(px) == list(range(16)) and px != bytes(range(16))
    # animation: splice a second image block before the trailer
    body = bytearray(g)
    assert body[-1] == 0x3B
    second = g[g.index(b"\x2c"):-1]
    with pytest.raises(NotImplementedError, match="animated"):
        decode_gif(bytes(body[:-1]) + second + b"\x3b")


def test_extensions_skipped_and_local_color_table():
    """A GCE + comment extension before the image must be skipped; a local
    color table must override the global one."""
    g = encode_gif(2, 2, 1, bytes([5, 9, 5, 9]))
    pos = g.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    withext = g[:pos] + gce + comment + g[pos:]
    assert decode_gif(withext) == (2, 2, 1, bytes([5, 9, 5, 9]))

    # rebuild the image block with an inverted LOCAL table (indexes swap
    # meaning) — decode must use it over the global table
    hdr_end = 13 + 3 * 2  # lsd + 2-entry global table
    img = bytearray(g[pos:])
    img[9] |= 0x80  # packed field (after the 0x2C type byte): LCT flag, 2 entries
    local = bytes([9, 9, 9, 5, 5, 5])
    patched = g[:pos] + bytes(img[:10]) + local + bytes(img[10:])
    assert decode_gif(patched) == (2, 2, 1, bytes([9, 5, 9, 5]))
    assert hdr_end == pos  # layout sanity: nothing between GCT and image


def test_sniff_and_decode_image_dispatch(spark):
    from simsearch_spark.multimodal.binary import decode_image, decode_image_meta

    g = encode_gif(6, 3, 1, bytes([7] * 18))
    assert decode_image(g) == (6, 3, 1, bytes([7] * 18))
    df = spark.createDataFrame(
        [(1, "image", bytearray(g), "image/gif")],
        "media_id long, kind string, payload binary, mime string",
    )
    (row,) = decode_image_meta(df).collect()
    assert (row.format, row.width, row.height) == ("gif", 6, 3)


def test_media_pixel_stats_routes_odd_ids_through_gif(spark, sf_dir):
    """The declared query's odd doc_ids decode from real GIF payloads and
    still hit the closed-form oracle means (lossless codec-invariance)."""
    from pyspark.sql import functions as F

    from simsearch_spark.queries.media import q_media_pixel_stats

    rows = q_media_pixel_stats(spark, sf_dir).where(F.col("media_id") % 2 == 1).collect()
    assert rows and all(r.decoded == "ok" for r in rows)
    # check the closed-form means on the GIF lane the test names
    # (d % 8 in (1, 5)) and SORT first: the old rows[:5] head rode the
    # single-task scan's doc_id order, which the r14 kernel fan-out
    # rightly does not preserve — and unsorted it could pull in a CCITT
    # bilevel id (d % 128 == 23), whose lane THRESHOLDS values to
    # {0, 255} by design (the oracle states the same closed form)
    gif_rows = sorted(
        (r for r in rows if int(r.media_id) % 8 in (1, 5)),
        key=lambda r: int(r.media_id),
    )
    assert len(gif_rows) >= 5
    for r in gif_rows[:5]:
        d = int(r.media_id)
        w = r.width
        a, b = d % 256, (d * 7 + 13) % 256
        expect = round((a * (w // 2) + b * (w - w // 2)) / w, 6)
        assert r.mean_c0 == expect


def test_interlaced_gif_roundtrip():
    """GIF89a appendix E four-pass interlace: encode with the flag, decode
    back to raster order — byte-identical across heights that exercise
    every pass boundary (h < 2, < 4, < 8, multi-pass)."""
    import random

    from simsearch_spark.multimodal.gif import decode_gif, encode_gif

    rng = random.Random(31)
    for w, h in [(5, 1), (4, 2), (3, 3), (7, 5), (6, 8), (9, 23), (16, 64)]:
        px = bytes(rng.randrange(4) * 80 for _ in range(w * h))
        g = encode_gif(w, h, 1, px, interlace=True)
        assert decode_gif(g) == (w, h, 1, px), (w, h)
        # the flag is really set (descriptor follows the 4-entry GCT)
        assert decode_gif(encode_gif(w, h, 1, px)) == (w, h, 1, px)
        assert g != encode_gif(w, h, 1, px) or h == 1


def test_animation_roundtrip_and_delays():
    from simsearch_spark.multimodal.gif import decode_gif_frames, encode_gif_animation

    frames = [bytes([v]) * 20 for v in (10, 200, 33, 7)]
    g = encode_gif_animation(5, 4, 1, frames, delay_cs=7)
    w, h, ch, out = decode_gif_frames(g)
    assert (w, h, ch) == (5, 4, 1)
    assert [d for d, _f in out] == [7, 7, 7, 7]
    assert [f for _d, f in out] == frames
    # RGB animation stays 3-channel
    rgb = [bytes([v, 0, v]) * 6 for v in (10, 20)]
    w, h, ch, out = decode_gif_frames(encode_gif_animation(3, 2, 3, rgb))
    assert ch == 3 and [f for _d, f in out] == rgb
    # single-image GIFs decode as a 1-frame animation
    g1 = encode_gif(3, 2, 1, bytes(range(6)))
    assert decode_gif_frames(g1)[3] == [(0, bytes(range(6)))]


def _gce(disposal, delay=0, transparent=None):
    flags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
    import struct as _s

    return _s.pack("<BBBBHB", 0x21, 0xF9, 4, flags, delay, transparent or 0) + b"\x00"


def test_animation_compositing_disposal_and_transparency():
    """Hand-built 2-frame animation: a 1x1 sub-rect frame with a
    transparent pixel + disposal semantics — the GCE paths an encoder of
    full-screen frames never exercises."""
    import struct as _s

    from simsearch_spark.multimodal.gif import _lzw_encode, decode_gif_frames

    # screen 2x2, GCT: 0=black 1=white 2=red, bg index 0
    gct = bytes([0, 0, 0, 255, 255, 255, 255, 0, 0]) + bytes(3)
    out = bytearray(b"GIF89a")
    out += _s.pack("<HHBBB", 2, 2, 0x81, 0, 0)  # GCT present, 4 entries
    out += gct

    def img(left, top, w, h, idx):
        b = bytearray(_s.pack("<BHHHHB", 0x2C, left, top, w, h, 0))
        b.append(2)  # min code size
        stream = _lzw_encode(bytes(idx), 2)
        for i in range(0, len(stream), 255):
            b.append(len(stream[i : i + 255]))
            b += stream[i : i + 255]
        b.append(0)
        return bytes(b)

    # frame 1: full screen all-white, disposal 3 (restore previous)
    out += _gce(3)
    out += img(0, 0, 2, 2, [1, 1, 1, 1])
    # frame 2: 1x1 red at (1,1), disposal 2, then a transparent 1x1 at (0,0)
    out += _gce(2)
    out += img(1, 1, 1, 1, [2])
    out += _gce(0, transparent=1)
    out += img(0, 0, 1, 1, [1])  # index 1 == transparent: leaves canvas
    out += b"\x3b"

    w, h, ch, frames = decode_gif_frames(bytes(out))
    assert (w, h, ch) == (2, 2, 3)
    f1, f2, f3 = [f for _d, f in frames]
    W, K, R = bytes([255] * 3), bytes(3), bytes([255, 0, 0])
    assert f1 == W * 4
    # disposal 3 after frame 1 restored the black canvas; red drawn at (1,1)
    assert f2 == K + K + K + R
    # disposal 2 after frame 2 restored (1,1) to bg; frame 3's transparent
    # pixel leaves (0,0) black
    assert f3 == K * 4
