"""Baseline JPEG codec (multimodal/jpeg.py): lossy round trips under PSNR
bounds, exactness where quantization guarantees it, explicit seams, fuzz,
and the Spark decode paths through decode_image."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from simsearch_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(w: int, h: int, ch: int) -> np.ndarray:
    img = np.zeros((h, w, ch), np.uint8)
    for y in range(h):
        for x in range(w):
            for c in range(ch):
                img[y, x, c] = (x * 5 + y * 7 + c * 11) % 256
    return img


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("dims", [(8, 8), (24, 16), (19, 17)])  # incl. partial MCUs
def test_round_trip_psnr(channels, dims):
    w, h = dims
    img = _gradient(w, h, channels)
    data = encode_jpeg(w, h, channels, img.tobytes(), quality=90)
    ww, hh, cc, out = decode_jpeg(data)
    assert (ww, hh, cc) == (w, h, channels)
    assert _psnr(img, np.frombuffer(out, np.uint8).reshape(h, w, channels)) > 35


def _smooth(w: int, h: int) -> np.ndarray:
    """Clamped (non-wrapping) gradient: modulo wrap edges are legitimately
    brutal for subsampled chroma and would test the content, not the codec."""
    img = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = (min(x * 5, 255), min(y * 9, 255), min(100 + x * 2, 255))
    return img


def test_round_trip_420_subsampling():
    img = _smooth(40, 24)
    data = encode_jpeg(40, 24, 3, img.tobytes(), quality=90, subsample=True)
    w, h, c, out = decode_jpeg(data)
    assert (w, h, c) == (40, 24, 3)
    assert _psnr(img, np.frombuffer(out, np.uint8).reshape(24, 40, 3)) > 33
    # odd dims with 4:2:0 (chroma plane padding path)
    img = _smooth(21, 13)
    data = encode_jpeg(21, 13, 3, img.tobytes(), quality=90, subsample=True)
    w, h, c, out = decode_jpeg(data)
    assert (w, h, c) == (21, 13, 3)
    assert _psnr(img, np.frombuffer(out, np.uint8).reshape(13, 21, 3)) > 30


def test_grayscale_block_constant_is_exact():
    """DC-only blocks at quality 85 (luma DC step <= 5) reconstruct with
    error < 0.5, so integer pixels survive exactly — the property the
    media_jpeg_stats oracle relies on."""
    for v in (0, 7, 100, 128, 213, 255):
        pix = bytes([v]) * (32 * 24)
        w, h, c, out = decode_jpeg(encode_jpeg(32, 24, 1, pix, quality=85))
        assert (w, h, c) == (32, 24, 1)
        assert out == pix
    # block-aligned two-tone: every 8x8 block constant -> exact
    row = bytes([40] * 16 + [200] * 16)
    pix = row * 24
    w, h, c, out = decode_jpeg(encode_jpeg(32, 24, 1, pix, quality=85))
    assert out == pix


def test_restart_markers_round_trip():
    """DRI/RSTn resync: same quantized coefficients, different entropy
    framing — decode output must be bit-identical to the non-restart
    encoding, for both gray and 4:2:0 color."""
    img = _gradient(40, 24, 1)
    plain = decode_jpeg(encode_jpeg(40, 24, 1, img.tobytes(), quality=85))
    rst = decode_jpeg(encode_jpeg(40, 24, 1, img.tobytes(), quality=85, restart_interval=2))
    assert plain == rst
    img3 = _smooth(40, 24)
    plain3 = decode_jpeg(encode_jpeg(40, 24, 3, img3.tobytes(), subsample=True))
    rst3 = decode_jpeg(
        encode_jpeg(40, 24, 3, img3.tobytes(), subsample=True, restart_interval=1)
    )
    assert plain3 == rst3


def test_quality_monotone():
    img = _gradient(32, 32, 3)
    lo = decode_jpeg(encode_jpeg(32, 32, 3, img.tobytes(), quality=20))[3]
    hi = decode_jpeg(encode_jpeg(32, 32, 3, img.tobytes(), quality=95))[3]
    p_lo = _psnr(img, np.frombuffer(lo, np.uint8).reshape(32, 32, 3))
    p_hi = _psnr(img, np.frombuffer(hi, np.uint8).reshape(32, 32, 3))
    assert p_hi > p_lo


def test_explicit_seams():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    # arithmetic-coded frame marker (SOF9) is a NotImplementedError seam
    # (progressive SOF2 is implemented as of r8)
    arith = bytearray(encode_jpeg(8, 8, 1, bytes(64), quality=85))
    idx = arith.find(b"\xff\xc0")
    arith[idx + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(arith))
    # a baseline scan relabeled SOF2 is MALFORMED progressive (Se=63 DC
    # scan), not a seam — it must fail loudly, not decode garbage
    prog = bytearray(encode_jpeg(8, 8, 1, bytes(64), quality=85))
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(bytes(prog))
    # r13: 12-bit decodes in SOF1/SOF2 frames — but T.81 defines baseline
    # as 8-bit, so a 12-bit SOF0 is MALFORMED, and other depths stay seams
    deep = bytearray(encode_jpeg(8, 8, 1, bytes(64), quality=85))
    idx = deep.find(b"\xff\xc0")
    deep[idx + 4] = 12  # precision byte of SOF0
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(deep))
    deep[idx + 4] = 10
    with pytest.raises(NotImplementedError, match="precision 10"):
        decode_jpeg(bytes(deep))
    # truncated entropy stream
    whole = encode_jpeg(24, 24, 3, _gradient(24, 24, 3).tobytes())
    with pytest.raises(ValueError):
        decode_jpeg(whole[: len(whole) // 2])


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_decode_jpeg_never_raises_low_level_errors(data):
    for payload in (data, b"\xff\xd8" + data):
        try:
            decode_jpeg(payload)
        except (ValueError, NotImplementedError):
            pass


@settings(max_examples=30, deadline=None)
@given(flip=st.integers(2, 400), byte=st.integers(0, 255))
def test_decode_jpeg_mutated_valid_payload(flip, byte):
    base = bytearray(encode_jpeg(16, 16, 3, _gradient(16, 16, 3).tobytes()))
    base[flip % len(base)] = byte
    try:
        decode_jpeg(bytes(base))
    except (ValueError, NotImplementedError):
        pass


# ---------------------------------------------------------------------------
# Spark paths via decode_image
# ---------------------------------------------------------------------------


def test_pixel_stats_decodes_jpeg(spark):
    from simsearch_spark.multimodal.binary import pixel_stats

    # block-constant grayscale -> exact decode -> exact means
    row = bytes([40] * 16 + [200] * 16)
    good = encode_jpeg(32, 8, 1, row * 8, quality=85)
    df = spark.createDataFrame(
        [(1, "image", good, "image/jpeg")],
        "media_id long, kind string, payload binary, mime string",
    )
    r = pixel_stats(df).collect()[0]
    assert r.decoded == "ok" and (r.width, r.height, r.channels) == (32, 8, 1)
    assert r.mean_c0 == (40 * 16 + 200 * 16) / 32


def test_resize_real_jpeg_payload(spark):
    from simsearch_spark.multimodal.binary import resize_images
    from simsearch_spark.multimodal.png import decode_png

    big = encode_jpeg(640, 480, 3, np.full((480, 640, 3), 90, np.uint8).tobytes())
    df = spark.createDataFrame(
        [(1, "image", big, "image/jpeg")],
        "media_id long, kind string, payload binary, mime string",
    )
    r = resize_images(df, max_w=320, max_h=320).collect()[0]
    assert r.resized == "resized" and (r.dst_width, r.dst_height) == (320, 240)
    w, h, ch, pix = decode_png(bytes(r.payload))  # resample re-encodes as PNG
    assert (w, h, ch) == (320, 240, 3)
    arr = np.frombuffer(pix, np.uint8)
    assert int(arr.min()) >= 88 and int(arr.max()) <= 92  # constant within quant error


# ---------------------------------------------------------------------------
# progressive (SOF2) — r8
# ---------------------------------------------------------------------------


def _prog_equals_baseline(w, h, ch, pix, quality=85, subsample=False):
    from simsearch_spark.multimodal.jpeg import encode_jpeg_progressive

    base = decode_jpeg(encode_jpeg(w, h, ch, pix, quality=quality, subsample=subsample))
    prog_payload = encode_jpeg_progressive(
        w, h, ch, pix, quality=quality, subsample=subsample
    )
    prog = decode_jpeg(prog_payload)
    assert prog == base  # identical quantizer -> bit-identical reconstruction
    return prog_payload


def test_progressive_equals_baseline_shapes():
    """Progressive decode must reproduce the baseline decode bit-for-bit
    (shared quantizer) across geometries, color, and 4:2:0 subsampling —
    the non-interleaved AC grids differ from the padded DC grid exactly
    when subsampled dimensions are odd-block."""
    rng = np.random.default_rng(7)
    for w, h, ch, sub in [
        (8, 8, 1, False), (17, 13, 1, False), (32, 32, 3, False),
        (23, 9, 3, False), (21, 17, 3, True), (100, 3, 1, False),
        (3, 100, 3, True), (1, 1, 1, False),
    ]:
        pix = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).tobytes()
        _prog_equals_baseline(w, h, ch, pix, subsample=sub)


def test_progressive_stream_structure():
    """The emitted stream really is multi-scan progressive: SOF2 frame,
    the 6-scan grayscale script (DC first, 2 AC bands, 2 AC refinements,
    DC refinement), per-scan DHTs; and smooth content exercises EOB runs
    (a long gradient compresses to fewer bytes than the sum of per-block
    EOB0s would allow)."""
    from simsearch_spark.multimodal.jpeg import encode_jpeg_progressive

    img = _gradient(48, 40, 1)
    payload = encode_jpeg_progressive(48, 40, 1, img.tobytes())
    assert payload.count(b"\xff\xc2") == 1 and b"\xff\xc0" not in payload
    assert payload.count(b"\xff\xda") == 6  # grayscale script
    decoded = np.frombuffer(decode_jpeg(payload)[3], np.uint8).reshape(40, 48)
    assert _psnr(img[..., 0], decoded) > 30


def test_progressive_truncation_raises():
    from simsearch_spark.multimodal.jpeg import encode_jpeg_progressive

    payload = encode_jpeg_progressive(24, 24, 1, bytes(range(256)) * 2 + bytes(64))
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) * 2 // 3])


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    ch=st.sampled_from([1, 3]),
    sub=st.booleans(),
    q=st.integers(5, 98),
    seed=st.integers(0, 2**31),
)
def test_progressive_equals_baseline_property(w, h, ch, sub, q, seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).tobytes()
    _prog_equals_baseline(w, h, ch, pix, quality=q, subsample=sub)


def test_progressive_through_decode_image_and_features(spark):
    """The Spark multimodal surface accepts progressive payloads end to
    end: decode_image dispatches on SOI, and extract_pixel_features gives
    the SAME embedding for baseline and progressive encodings of one
    image (shared quantizer) — so image dedup treats them as exact dups."""
    from simsearch_spark.multimodal.binary import decode_image, extract_pixel_features
    from simsearch_spark.multimodal.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(12, 20), dtype=np.uint8)
    b = encode_jpeg(20, 12, 1, img.tobytes())
    p = encode_jpeg_progressive(20, 12, 1, img.tobytes())
    assert decode_image(p) == decode_image(b)
    df = spark.createDataFrame(
        [(1, "image", b, "image/jpeg"), (2, "image", p, "image/jpeg")],
        "media_id long, kind string, payload binary, mime string",
    )
    embs = {r.media_id: r.embedding for r in extract_pixel_features(df).collect()}
    assert embs[1] == embs[2]


@settings(max_examples=40, deadline=None)
@given(flip=st.integers(2, 2000), byte=st.integers(0, 255))
def test_progressive_mutated_payload_bounded_errors(flip, byte):
    """Byte-flipped progressive streams must die with ValueError /
    NotImplementedError only — the same bounded-exception contract as the
    baseline path (the multi-scan state machine adds new parse surfaces:
    scan headers, EOB runs, refinement bit reads)."""
    from simsearch_spark.multimodal.jpeg import encode_jpeg_progressive

    base = bytearray(
        encode_jpeg_progressive(16, 16, 3, _gradient(16, 16, 3).tobytes())
    )
    base[flip % len(base)] = byte
    try:
        decode_jpeg(bytes(base))
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=25, deadline=None)
@given(cut=st.integers(2, 4000))
def test_progressive_truncated_payload_bounded_errors(cut):
    from simsearch_spark.multimodal.jpeg import encode_jpeg_progressive

    whole = encode_jpeg_progressive(24, 16, 1, bytes(range(256)) * 1 + bytes(128))
    try:
        decode_jpeg(whole[: cut % len(whole)])
    except (ValueError, NotImplementedError):
        pass


def _refine_roundtrip(blocks, ss, se, al):
    """Encode one AC refinement scan over crafted TRUTH coefficient blocks,
    then decode it against the prior-scan state; returns decoded blocks."""
    from simsearch_spark.multimodal.jpeg import (
        _ac_refine_block,
        _BitReader,
        _BitWriter,
        _build_decode_table,
        _build_encode_table,
        _enc_ac_refine,
        _fixed_table,
        _ScanSink,
    )

    counter = _ScanSink()
    _enc_ac_refine(counter, blocks, ss, se, al)
    bits, vals = _fixed_table(counter.syms or {0x00})
    enc_tab = _build_encode_table(bits, vals)
    bw = _BitWriter()
    _enc_ac_refine(_ScanSink(bw, enc_tab), blocks, ss, se, al)
    bw.flush()
    dec_tab = _build_decode_table(bits, vals)
    reader = _BitReader(bytes(bw.out) + b"\xff\xd9", 0)
    out = []
    eobrun = 0
    for truth in blocks:
        prior = np.zeros(64, dtype=np.int64)
        for k in range(ss, se + 1):
            t = int(truth[k])
            hi = abs(t) >> (al + 1)  # magnitude known before this scan
            prior[k] = (1 if t >= 0 else -1) * (hi << (al + 1))
        eobrun = _ac_refine_block(reader, dec_tab, prior, ss, se, al, eobrun)
        out.append(prior)
    return out


def _expected_after_refine(truth, ss, se, al):
    exp = np.zeros(64, dtype=np.int64)
    for k in range(ss, se + 1):
        t = int(truth[k])
        exp[k] = (1 if t >= 0 else -1) * ((abs(t) >> al) << al)
    return exp


@pytest.mark.parametrize("al", [0, 1, 2])
def test_ac_refinement_crafted_blocks(al):
    """Direct round trip of the AC successive-approximation scan on blocks
    crafted to force every hard path: ZRL runs (>15 zero-history gaps) with
    buffered correction bits for history coefficients inside the gap, new
    significance after the gap, multi-block EOB runs carrying deferred
    correction bits, and all-zero bands."""
    lo = 1 << al          # newly-significant magnitude at this scan
    hi = 6 << al          # history magnitude (known from earlier scans)
    b1 = np.zeros(64, dtype=np.int64)   # ZRL + interleaved history
    b1[3], b1[10] = hi, -hi             # history inside the zero gap
    b1[30] = lo                         # new significance after >15 zeros
    b1[60] = -(hi | lo)                 # history receiving a 1-correction
    b2 = np.zeros(64, dtype=np.int64)   # EOB-run block w/ trailing history
    b2[5] = hi | lo
    b3 = np.zeros(64, dtype=np.int64)   # fully empty band
    b4 = np.zeros(64, dtype=np.int64)   # new significance at band edges
    b4[1], b4[63] = -lo, lo
    blocks = [b1, b2, b3, b4]
    got = _refine_roundtrip(blocks, 1, 63, al)
    for truth, dec in zip(blocks, got):
        assert (dec == _expected_after_refine(truth, 1, 63, al)).all()


def test_ac_refinement_long_zrl_chain():
    """Two chained ZRL crossings (>32 zero-history positions) with history
    coefficients scattered through BOTH gaps — the correction bits must
    interleave with the right crossing, not dump after the first ZRL."""
    al = 1
    b = np.zeros(64, dtype=np.int64)
    b[2], b[20], b[38] = 6 << al, -(6 << al), 7 << al  # history in the gaps
    b[40] = 1 << al                                    # new sig after ~36 zeros
    got = _refine_roundtrip([b], 1, 63, al)
    assert (got[0] == _expected_after_refine(b, 1, 63, al)).all()


def test_progressive_restart_markers_round_trip():
    """Progressive + DRI/RSTn: predictor and EOB-run resets at every
    restart, byte-aligned resync in all six scan kinds — decode output must
    stay bit-identical to the non-restart progressive encoding (same
    quantized coefficients), gray and 4:2:0 color."""
    from simsearch_spark.multimodal.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    for w, h, ch, sub in [(24, 16, 1, False), (21, 17, 3, True)]:
        pix = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).tobytes()
        plain = decode_jpeg(encode_jpeg_progressive(w, h, ch, pix, subsample=sub))
        for ri in (1, 2, 5):
            rst = decode_jpeg(
                encode_jpeg_progressive(w, h, ch, pix, subsample=sub, restart_interval=ri)
            )
            assert rst == plain


def test_cmyk_and_ycck():
    """r12: 4-component JPEG — Adobe APP14 transform 0 (direct inverted
    CMYK) and 2 (YCCK).  Uniform images are block-constant, so q85
    decodes each component exactly and the naive composite
    R = round(C'*K'/255) is a closed form."""
    import numpy as np

    # uniform inverted-CMYK values
    for transform in (0, 2):
        for ci, mi, yi, ki in [(255, 255, 255, 255), (200, 100, 50, 230),
                               (0, 128, 17, 255)]:
            w, h = 10, 6
            px = bytes([ci, mi, yi, ki]) * (w * h)
            blob = encode_jpeg(w, h, 4, px, cmyk_transform=transform)
            assert b"Adobe" in blob[:40]
            gw, gh, gch, gpix = decode_jpeg(blob)
            assert (gw, gh, gch) == (w, h, 3)
            exp = tuple(
                int(np.rint(v * ki / 255.0)) for v in (ci, mi, yi)
            )
            if transform == 0:
                # integer component planes -> q85 block-constant exactness
                assert gpix[:3] == bytes(exp), (ci, mi, yi, ki)
            else:
                # YCCK's forward YCbCr planes are non-integer, so the
                # quantized DC may shift the composite by one level
                assert all(
                    abs(g - e) <= 1 for g, e in zip(gpix[:3], exp)
                ), (ci, mi, yi, ki)
            assert all(
                gpix[3 * i : 3 * i + 3] == gpix[:3] for i in range(w * h)
            )
    # no Adobe marker: values are PLAIN CMYK (inverted internally) —
    # strip APP14 and re-state the values as non-inverted
    w, h = 8, 8
    px = bytes([200, 100, 50, 230]) * (w * h)
    blob = encode_jpeg(w, h, 4, px, cmyk_transform=0)
    i = blob.index(b"\xff\xee")
    (ln,) = struct.unpack(">H", blob[i + 2 : i + 4])
    stripped = blob[:i] + blob[i + 2 + ln :]
    gw, gh, gch, gpix = decode_jpeg(stripped)
    exp = tuple(
        int(np.rint((255 - v) * (255 - 230) / 255.0)) for v in (200, 100, 50)
    )
    assert (gch, gpix[:3]) == (3, bytes(exp))
    # Adobe transform 0 with THREE components = stored RGB
    rgb = bytes([10, 200, 60]) * (w * h)
    blob3 = encode_jpeg(w, h, 3, rgb)
    # splice an APP14 transform-0 marker after SOI
    app14 = b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" + struct.pack(
        ">HHHB", 100, 0, 0, 0
    )
    spliced = blob3[:2] + app14 + blob3[2:]
    w3, h3, c3, p3 = decode_jpeg(spliced)
    # stored YCbCr read AS RGB: just assert it decodes and differs from
    # the YCbCr interpretation (the transform byte is honored)
    assert (w3, h3, c3) == (w, h, 3)
    assert p3[:3] != decode_jpeg(blob3)[3][:3]
    # unknown transform byte on 4 components = named seam
    blob = encode_jpeg(4, 4, 4, bytes([1, 2, 3, 4]) * 16, cmyk_transform=0)
    i = blob.index(b"Adobe") + 11
    bad = blob[:i] + b"\x07" + blob[i + 1 :]
    with pytest.raises(NotImplementedError, match="transform 7"):
        decode_jpeg(bad)
    with pytest.raises(ValueError, match="transform 5"):
        encode_jpeg(2, 2, 4, bytes(16), cmyk_transform=5)
    with pytest.raises(ValueError, match="4:4:4"):
        encode_jpeg(2, 2, 4, bytes(16), subsample=True)
    from simsearch_spark.multimodal.jpeg import encode_jpeg_progressive

    with pytest.raises(ValueError, match="progressive CMYK"):
        encode_jpeg_progressive(2, 2, 4, bytes(16))


def test_twelve_bit_extended_sequential():
    """r13 (closes the 12-bit seam): SOF1 extended-sequential frames at
    precision 12 decode through the shared pipeline — 16-bit (Pq=1) DQT,
    level shift 2048, /16 reduction to the 8-bit contract — and the
    encoder dual writes flat wide-category Huffman tables.  Widened
    (v*16) block-constant images round-trip exactly, the Annex-K
    relative quantization carries over, and malformed combinations stay
    loud."""
    import math

    from simsearch_spark.multimodal.jpeg import encode_jpeg_12

    # exact on the widened level set, any block-constant value
    for v in (0, 1, 64, 200, 255):
        blob = encode_jpeg_12(16, 8, [v * 16] * 128, quality=85)
        i = blob.find(b"\xff\xc1")
        assert i > 0 and blob[i + 4] == 12  # SOF1, precision byte
        assert b"\xff\xc0" not in blob[: i + 2]
        assert decode_jpeg(blob) == (16, 8, 1, bytes([v] * 128)), v
    # 16-bit DQT really is Pq=1
    blob = encode_jpeg_12(8, 8, [1000] * 64)
    d = blob.find(b"\xff\xdb")
    assert blob[d + 4] == 0x10  # Pq=1, Tq=0
    # smooth 12-bit content: small error after reduction
    vals = [int(2048 + 1800 * math.sin((x + 2 * y) / 7)) for y in range(24)
            for x in range(24)]
    w, h, ch, px = decode_jpeg(encode_jpeg_12(24, 24, vals, quality=95))
    assert (w, h, ch) == (24, 24, 1)
    assert max(abs(px[i] - vals[i] / 16) for i in range(len(vals))) < 6
    # full 12-bit dynamic range survives (category-15 DC diffs)
    hi = [0, 4095] * 32
    w, h, ch, px = decode_jpeg(encode_jpeg_12(8, 8, hi[:64], quality=100))
    assert (w, h, ch) == (8, 8, 1)
    # sample bounds enforced
    with pytest.raises(ValueError, match="0..4095"):
        encode_jpeg_12(2, 1, [0, 4096])
    with pytest.raises(ValueError, match="sample buffer"):
        encode_jpeg_12(2, 2, [0, 0, 0])
