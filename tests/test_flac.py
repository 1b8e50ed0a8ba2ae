"""Tests for the from-scratch FLAC codec (multimodal/flac.py).

Round-trip properties cover what the encoder emits (CONSTANT / FIXED /
VERBATIM, independent + mid/side stereo); hand-CRAFTED frames cover the
decode paths a minimal encoder never produces — LPC subframes,
multi-partition Rice, RICE2, escape partitions, wasted bits, left/side and
right/side stereo — the same crafted-stream discipline as the progressive-
JPEG AC-refinement tests (tests/test_jpeg.py).
"""

import math
import random
import struct

import pytest

from simsearch_spark.multimodal.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _write_utf8_num,
    decode_flac,
    encode_flac,
)


# ---------------------------------------------------------------------------
# encoder round-trips
# ---------------------------------------------------------------------------

def test_roundtrip_random_pcm_all_modes():
    rng = random.Random(7)
    for ch, ms in ((1, False), (2, False), (2, True), (3, False)):
        for n in (1, 5, 192, 1000, 4097):
            pcm = [rng.randint(-32768, 32767) for _ in range(n * ch)]
            rate, c, dec = decode_flac(encode_flac(pcm, 8000, channels=ch, mid_side=ms))
            assert (rate, c, dec) == (8000, ch, pcm), (ch, ms, n)


def test_roundtrip_structured_signals_and_compression():
    smooth = [int(3000 * math.sin(i / 50)) for i in range(3000)]
    enc = encode_flac(smooth, 44100)
    rate, ch, dec = decode_flac(enc)
    assert (rate, ch, dec) == (44100, 1, smooth)
    assert len(enc) < len(smooth)  # FIXED+rice actually compresses (<1 B/sample)
    assert decode_flac(encode_flac([5] * 1000, 8000))[2] == [5] * 1000  # CONSTANT
    verb = encode_flac(smooth, 8000, force_verbatim=True)
    assert decode_flac(verb)[2] == smooth


def test_corruption_and_seams():
    pcm = [i % 100 - 50 for i in range(500)]
    enc = bytearray(encode_flac(pcm, 8000))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxx" + bytes(enc[4:]))
    bad = bytearray(enc)
    bad[-3] ^= 0x40  # flip a bit inside the last frame
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError):
        decode_flac(bytes(enc[: len(enc) - 4]))  # truncated
    # 24-bit streams decode with the >>8 reduction (r12)
    w = _craft(
        blocksize=4, bps=24,
        subframes=[lambda bw: _write_verbatim(bw, [0, 256, -256, 511], 24)],
    )
    assert decode_flac(w) == (8000, 1, [0, 1, -1, 1])
    # a reserved/illegal coded size stays the named seam (7-bit)
    w = _craft(blocksize=2, bps=7,
               subframes=[lambda bw: _write_verbatim(bw, [0, 1], 7)])
    with pytest.raises(NotImplementedError, match="sample size 7"):
        decode_flac(w)


def test_bit_depths_round_trip():
    """r12: every legal coded sample size — wider depths are the exact
    int16 widening; narrower depths exact on their level set."""
    rng = random.Random(31)
    pcm = [rng.randrange(-32768, 32768) for _ in range(700)]
    for bps in (20, 24, 32):
        for ms in (False, True):
            blob = encode_flac(
                pcm, 16000, 2, mid_side=ms, bits_per_sample=bps,
                block_size=256,
            )
            assert decode_flac(blob) == (16000, 2, pcm), (bps, ms)
    for bps in (8, 12):
        step = 1 << (16 - bps)
        pcm_n = [v - v % step for v in pcm]
        blob = encode_flac(pcm_n, 8000, 1, bits_per_sample=bps)
        assert decode_flac(blob) == (8000, 1, pcm_n), bps
        with pytest.raises(ValueError, match="multiples of"):
            encode_flac([1], 8000, bits_per_sample=bps)
    with pytest.raises(ValueError, match="sample size 9"):
        encode_flac([0], 8000, bits_per_sample=9)


# ---------------------------------------------------------------------------
# crafted streams for decoder-only paths
# ---------------------------------------------------------------------------

def _craft(blocksize, subframes, ch_code=None, bps=16, rate=8000):
    """Single-frame FLAC stream with caller-written subframe bodies."""
    nch = len(subframes) if ch_code is None or ch_code <= 7 else 2
    if ch_code is None:
        ch_code = nch - 1
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(blocksize, 36)
    for _ in range(16):
        si.write(0, 8)
    body = si.bytes()
    out = bytearray(b"fLaC")
    out.append(0x80)
    out += len(body).to_bytes(3, "big")
    out += body

    fw = _BitWriter()
    fw.write(0b11111111111110, 14)
    fw.write(0, 2)
    fw.write(7, 4)   # 16-bit explicit blocksize
    fw.write(0, 4)   # rate from STREAMINFO
    fw.write(ch_code, 4)
    fw.write(0b100 if bps == 16 else 0, 3)  # frame bps code (0 = streaminfo)
    fw.write(0, 1)
    _write_utf8_num(fw, 0)
    fw.write(blocksize - 1, 16)
    fw.align_byte()
    hdr = fw.bytes()
    fb = _BitWriter()
    for b in hdr:
        fb.write(b, 8)
    fb.write(_crc8(hdr), 8)
    for sub in subframes:
        sub(fb)
    fb.align_byte()
    frame = fb.bytes()
    out += frame
    out += struct.pack(">H", _crc16(frame))
    return bytes(out)


def _write_verbatim(bw, x, bps):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in x:
        bw.write(v & ((1 << bps) - 1), bps)


def _write_rice(bw, v, k):
    u = (v << 1) if v >= 0 else ((-v) << 1) - 1
    bw.write_unary(u >> k)
    if k:
        bw.write(u & ((1 << k) - 1), k)


def test_crafted_lpc_subframe():
    """LPC order 2, precision 15, shift 12, qlp [2·4096, -4096] ≈ the FIXED
    order-2 predictor — residuals computed with the decoder's own integer
    formula must reconstruct the signal exactly."""
    x = [int(2000 * math.sin(i / 7)) + (i % 13) for i in range(64)]
    order, prec, shift = 2, 15, 12  # prec must hold qlp[0]=8192 signed
    qlp = [2 << 12, -(1 << 12)]

    def sub(bw):
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)  # LPC, order 2
        bw.write(0, 1)
        for v in x[:order]:
            bw.write(v & 0xFFFF, 16)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in qlp:
            bw.write(c & ((1 << prec) - 1), prec)
        bw.write(0, 2)  # rice method 0
        bw.write(0, 4)  # one partition
        resid = []
        for i in range(order, len(x)):
            pred = (qlp[0] * x[i - 1] + qlp[1] * x[i - 2]) >> shift
            resid.append(x[i] - pred)
        k = 6
        bw.write(k, 4)
        for v in resid:
            _write_rice(bw, v, k)

    rate, ch, dec = decode_flac(_craft(len(x), [sub]))
    assert dec == x


def test_crafted_rice_partitions_and_rice2():
    """Partition order 2 (4 partitions, distinct k each) under RICE2
    5-bit parameters, FIXED order 1."""
    x = [((i * 37) % 200) - 100 for i in range(64)]
    order = 1

    def sub(bw):
        bw.write(0, 1)
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write(v & 0xFFFF, 16)
        resid = [x[i] - x[i - 1] for i in range(order, len(x))]
        bw.write(1, 2)   # RICE2
        bw.write(2, 4)   # partition order 2 → 4 partitions of 16
        ks = [3, 5, 7, 2]
        pos = 0
        for pi, k in enumerate(ks):
            count = 16 - (order if pi == 0 else 0)
            bw.write(k, 5)
            for v in resid[pos : pos + count]:
                _write_rice(bw, v, k)
            pos += count

    rate, ch, dec = decode_flac(_craft(len(x), [sub]))
    assert dec == x


def test_crafted_escape_partitions():
    """Escape-coded partitions: raw 9-bit residuals, and the raw=0 case
    meaning an all-zero partition."""
    x = [0] * 16 + [((i * 11) % 100) - 50 for i in range(16)]

    def sub(bw):
        bw.write(0, 1)
        bw.write(8, 6)  # FIXED order 0: residual == signal
        bw.write(0, 1)
        bw.write(0, 2)  # rice method 0
        bw.write(1, 4)  # 2 partitions of 16
        bw.write(0xF, 4)  # escape
        bw.write(0, 5)    # raw bits = 0 → all-zero partition
        bw.write(0xF, 4)  # escape
        bw.write(9, 5)    # 9-bit raw residuals
        for v in x[16:]:
            bw.write(v & 0x1FF, 9)

    rate, ch, dec = decode_flac(_craft(len(x), [sub]))
    assert dec == x


def test_crafted_wasted_bits():
    """Samples sharing 2 trailing zero bits, stored shifted with the
    wasted-bits-per-sample unary prefix."""
    x = [v * 4 for v in ([0, 3, -5, 7, 100, -100, 31, -2] * 4)]

    def sub(bw):
        bw.write(0, 1)
        bw.write(1, 6)   # VERBATIM
        bw.write(1, 1)   # wasted flag
        bw.write_unary(1)  # unary 1 → wasted = 2
        for v in x:
            bw.write((v >> 2) & ((1 << 14) - 1), 14)  # eff bps = 16-2

    rate, ch, dec = decode_flac(_craft(len(x), [sub]))
    assert dec == x


@pytest.mark.parametrize("mode", [8, 9])
def test_crafted_left_side_right_side(mode):
    lft = [int(900 * math.sin(i / 9)) for i in range(32)]
    rgt = [int(700 * math.cos(i / 5)) for i in range(32)]
    side = [l_ - r_ for l_, r_ in zip(lft, rgt)]
    if mode == 8:   # left/side: channels are (left, side), side bps 17
        subs = [
            lambda bw: _write_verbatim(bw, lft, 16),
            lambda bw: _write_verbatim(bw, side, 17),
        ]
    else:           # right/side: channels are (side, right)
        subs = [
            lambda bw: _write_verbatim(bw, side, 17),
            lambda bw: _write_verbatim(bw, rgt, 16),
        ]
    rate, ch, dec = decode_flac(_craft(32, subs, ch_code=mode))
    assert ch == 2
    assert dec[0::2] == lft and dec[1::2] == rgt


def test_audio_stats_routes_flac_and_bounds_unsupported(spark):
    """The gated Spark path: FLAC payloads decode for real through
    audio_stats' dispatcher; an MP3-framed payload yields a bounded
    failure-reason row naming the seam, not an exception."""
    from simsearch_spark.multimodal.binary import audio_stats

    wave = ([2000] * 4 + [-2000] * 4) * 6
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_flac(wave, 8000))),
            (2, bytearray(b"\xff\xfb\x90\x00" + b"\x00" * 64)),  # MPEG frame sync
        ],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in audio_stats(df).collect()}
    assert rows[1].decoded == "ok"
    assert rows[1].n_samples == len(wave)
    assert rows[1].rms == 2000.0  # square wave: RMS == amplitude
    assert "audio codec not supported" in rows[2].decoded
    assert rows[2].n_samples == -1


def test_flac_and_wav_decode_identically():
    """The lossless contract the fixture oracles rely on: the same PCM
    through encode_wav and encode_flac decodes to identical samples."""
    from simsearch_spark.multimodal.wav import decode_wav, encode_wav

    p, c, amp = 8, 5, 3100
    wave = ([amp] * (p // 2) + [-amp] * (p // 2)) * c
    assert decode_wav(encode_wav(wave, 8000)) == decode_flac(encode_flac(wave, 8000))


def test_empty_stream_roundtrip():
    rate, ch, dec = decode_flac(encode_flac([], 8000))
    assert (rate, ch, dec) == (8000, 1, [])


def test_decode_flac_never_raises_low_level_errors():
    """Arbitrary bytes (optionally magic-prefixed, optionally grafted onto
    a valid stream) must produce a result or a CONTRACTED exception —
    never struct.error/IndexError/OverflowError, which would escape the
    audio operators' catch and kill a Spark task (the decode_png/decode_wav
    fuzz discipline)."""
    import random as _random

    rng = _random.Random(99)
    valid = encode_flac([i % 200 - 100 for i in range(300)], 8000)
    for trial in range(300):
        n = rng.randint(0, 120)
        junk = bytes(rng.randrange(256) for _ in range(n))
        for payload in (
            junk,
            b"fLaC" + junk,
            valid[: rng.randint(0, len(valid))],
            valid[:20] + junk,
        ):
            try:
                decode_flac(payload)
            except (ValueError, NotImplementedError):
                pass


def test_decode_flac_mutated_valid_stream():
    """Single-byte corruption of a valid stream: decode returns samples or
    raises a contracted error (almost always a CRC mismatch)."""
    import random as _random

    rng = _random.Random(5)
    valid = bytearray(encode_flac([i % 500 - 250 for i in range(400)], 8000))
    for _ in range(200):
        b = bytearray(valid)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            decode_flac(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_wide_bps_payload_bounded():
    """Self-review regression: at 24/32-bit, square-wave residuals outgrow
    the Rice k<=14 ceiling — the encoder must fall back to VERBATIM so the
    subframe is bounded by bs*bps bits, not ~1000x unary blowup."""
    amp, half, cycles = 20900, 3, 9
    wave = ([amp] * half + [-amp] * half) * cycles
    b16 = encode_flac(wave, 8000)
    for bps in (24, 32):
        blob = encode_flac(wave, 8000, bits_per_sample=bps)
        # generous bound: a few x the 16-bit size, never the 700 kB blowup
        assert len(blob) < 8 * len(b16), (bps, len(blob), len(b16))
        assert decode_flac(blob) == (8000, 1, wave)
