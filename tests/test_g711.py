"""Tests for G.711 μ-law/A-law companding (multimodal/g711.py) and its WAV
integration: exhaustive cross-implementation agreement with CPython's
``audioop`` (the CCITT reference code), idempotence on representable
levels, container round-trips, and the media-query routing."""

import struct

import pytest

from simsearch_spark.multimodal.g711 import (
    alaw_decode,
    alaw_encode,
    ulaw_decode,
    ulaw_encode,
)
from simsearch_spark.multimodal.wav import decode_wav, encode_wav

try:  # removed in Python 3.13 — the independent oracle, not a dependency
    import audioop
except ImportError:  # pragma: no cover
    audioop = None


@pytest.mark.skipif(audioop is None, reason="audioop removed (3.13+)")
def test_encode_matches_reference_exhaustively():
    """Every one of the 65536 int16 values encodes to the same byte as
    CPython's CCITT reference implementation, both laws."""
    pcm = list(range(-32768, 32768))
    buf = struct.pack(f"<{len(pcm)}h", *pcm)
    assert bytes(ulaw_encode(x) for x in pcm) == audioop.lin2ulaw(buf, 2)
    assert bytes(alaw_encode(x) for x in pcm) == audioop.lin2alaw(buf, 2)


@pytest.mark.skipif(audioop is None, reason="audioop removed (3.13+)")
def test_decode_matches_reference_for_all_codes():
    for c in range(256):
        assert ulaw_decode(c) == struct.unpack("<h", audioop.ulaw2lin(bytes([c]), 2))[0]
        assert alaw_decode(c) == struct.unpack("<h", audioop.alaw2lin(bytes([c]), 2))[0]


def test_idempotent_on_representable_levels():
    """encode(decode(c)) == c for every code (μ-law's two zero codes both
    decode to 0, whose canonical encoding is one of them) — the property
    that makes representable-amplitude synthesis LOSSLESS."""
    for c in range(256):
        v = ulaw_decode(c)
        assert ulaw_decode(ulaw_encode(v)) == v
        assert alaw_encode(alaw_decode(c)) == c


def test_quantization_error_bounded_and_monotone():
    """Decode levels are sign-symmetric and strictly monotone per segment;
    encode maps every int16 to a level within its segment's step size."""
    ulevels = sorted({ulaw_decode(c) for c in range(256)})
    assert ulevels == sorted(-v for v in ulevels)
    for x in range(-32768, 32768, 997):
        err = abs(ulaw_decode(ulaw_encode(x)) - max(-32635, min(32635, x)))
        assert err <= 4 + abs(x) / 16  # segment step grows ~x/16
        err_a = abs(alaw_decode(alaw_encode(x)) - max(-32768, min(32767, x)))
        assert err_a <= 8 + abs(x) / 16


def test_wav_g711_roundtrip_on_representable_wave():
    """A square wave on representable levels survives WAV(tag 7/6) encode →
    decode exactly — the media_audio_stats routing contract."""
    amp_u = ((8 * 9 + 132) << 3) - 132  # m=9, e=3
    wave = ([amp_u] * 3 + [-amp_u] * 3) * 5
    rate, ch, out = decode_wav(encode_wav(wave, 8000, codec="ulaw"))
    assert (rate, ch, out) == (8000, 1, wave)
    amp_a = ((7 + 16) << (4 + 3)) + (1 << (4 + 2))  # m=7, e=4
    wave = ([amp_a] * 2 + [-amp_a] * 2) * 7
    rate, ch, out = decode_wav(encode_wav(wave, 16000, codec="alaw"))
    assert (rate, ch, out) == (16000, 1, wave)
    # odd-length G.711 data chunk must stay word-aligned and parseable
    rate, ch, out = decode_wav(encode_wav([amp_u, -amp_u, amp_u], 8000, codec="ulaw"))
    assert out == [amp_u, -amp_u, amp_u]


def test_wav_seams_still_named():
    """Unknown tags and wrong bit depths keep their bounded-failure names."""
    good = bytearray(encode_wav([100, -100], 8000, codec="ulaw"))
    pos = good.index(b"fmt ") + 8
    bad = bytearray(good)
    bad[pos:pos + 2] = struct.pack("<H", 2)  # MS-ADPCM
    with pytest.raises(NotImplementedError, match="format tag 2"):
        decode_wav(bytes(bad))
    bad = bytearray(good)
    bad[pos + 14:pos + 16] = struct.pack("<H", 16)  # G.711 must be 8-bit
    with pytest.raises(ValueError, match="must be 8"):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="unknown WAV codec"):
        encode_wav([1], 8000, codec="opus")


def test_audio_stats_routes_g711_docs(spark, sf_dir):
    """The declared query's G.711-routed documents decode to the exact
    closed-form stats (lossless via representable amplitudes)."""
    from pyspark.sql import functions as F

    from simsearch_spark.queries.media import q_media_audio_stats

    rows = q_media_audio_stats(spark, sf_dir).where(
        (F.col("media_id") % 8).isin(3, 7)
    ).collect()
    assert rows and all(r.decoded == "ok" for r in rows)
    for r in rows[:8]:
        d = int(r.media_id)
        e = (d // 16) % 8
        if d % 8 == 3:
            amp = ((8 * (d % 15 + 1) + 132) << e) - 132
        else:
            m = d % 16
            amp = (16 * m + 8) if e == 0 else ((m + 16) << (e + 3)) + (1 << (e + 2))
        assert r.rms == float(amp), (d, r.rms, amp)
