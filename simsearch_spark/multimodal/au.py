"""Dependency-free Sun/NeXT AU (".snd") codec, r12 — the simplest real
audio container (6 big-endian uint32 header fields + data), still common
for telephony corpora.

Scope: encoding 1 (G.711 μ-law, via multimodal/g711.py — lossy in
general, exact on representable levels), 2/3/4/5 (8/16/24/32-bit
linear PCM, big-endian — r13 adds the non-16 widths with the WAV
module's widening/reduction conventions, except that AU's 8-bit is
SIGNED per spec where WAV's is offset-128), 6/7 (IEEE float32/float64
BE, ±1.0 full scale — ``s/32768.0`` is float32-exact for every int16,
r12), and 27 (G.711 A-law, r12).  Other encodings raise
``NotImplementedError``.  An
unknown data size (0xFFFFFFFF, legal per spec) reads to end of payload.
The annotation field between header and data is honored via the data
offset.  The reference engine has no audio operators (LLM-pipeline
extension surface).
"""

from __future__ import annotations

import struct

__all__ = ["encode_au", "decode_au"]

_MAGIC = b".snd"
_ENC_ULAW = 1
_ENC_PCM8 = 2
_ENC_PCM16 = 3
_ENC_PCM24 = 4
_ENC_PCM32 = 5
_ENC_FLOAT32 = 6
_ENC_FLOAT64 = 7
_ENC_ALAW = 27
_UNKNOWN_SIZE = 0xFFFFFFFF


def encode_au(
    samples: list[int], sample_rate: int, channels: int = 1, codec: str = "pcm16"
) -> bytes:
    """Interleaved int16 samples → AU bytes.  codec: ``pcm16``
    (encoding 3, BE), ``pcm8``/``pcm24``/``pcm32`` (encodings 2/4/5,
    r13 — 8-bit truncates to the signed high byte, 24/32 widen exactly),
    ``ulaw``/``alaw`` (encodings 1/27, G.711-companded), or
    ``float32``/``float64`` (encodings 6/7, s/32768.0 — exact)."""
    if codec == "pcm16":
        enc = _ENC_PCM16
        data = struct.pack(f">{len(samples)}h", *samples)
    elif codec == "pcm8":
        enc = _ENC_PCM8
        data = struct.pack(f">{len(samples)}b", *(int(s) >> 8 for s in samples))
    elif codec == "pcm24":
        enc = _ENC_PCM24
        data = b"".join(
            (int(s) << 8).to_bytes(3, "big", signed=True) for s in samples
        )
    elif codec == "pcm32":
        enc = _ENC_PCM32
        data = struct.pack(f">{len(samples)}i", *(int(s) << 16 for s in samples))
    elif codec == "ulaw":
        from simsearch_spark.multimodal.g711 import ulaw_encode

        enc = _ENC_ULAW
        data = bytes(ulaw_encode(int(s)) for s in samples)
    elif codec == "alaw":
        from simsearch_spark.multimodal.g711 import alaw_encode

        enc = _ENC_ALAW
        data = bytes(alaw_encode(int(s)) for s in samples)
    elif codec in ("float32", "float64"):
        enc = _ENC_FLOAT32 if codec == "float32" else _ENC_FLOAT64
        fmt = "f" if codec == "float32" else "d"
        data = struct.pack(
            f">{len(samples)}{fmt}", *(int(s) / 32768.0 for s in samples)
        )
    else:
        raise ValueError(f"unknown AU codec {codec!r}")
    hdr = struct.pack(
        ">4sIIIII", _MAGIC, 24, len(data), enc, int(sample_rate), int(channels)
    )
    return hdr + data


def decode_au(payload: bytes) -> tuple[int, int, list[int]]:
    """AU bytes → (sample_rate, channels, interleaved int16 samples) —
    the ``decode_wav`` return contract."""
    if payload[:4] != _MAGIC:
        raise ValueError("not an AU (.snd) payload")
    try:
        _m, off, size, enc, rate, channels = struct.unpack(">4sIIIII", payload[:24])
    except struct.error as e:
        raise ValueError(f"truncated AU header: {e}") from e
    if off < 24 or off > len(payload):
        raise ValueError(f"AU data offset {off} outside payload")
    if rate == 0 or channels == 0:
        raise ValueError(f"degenerate AU header: rate={rate} channels={channels}")
    data = payload[off:]
    if size != _UNKNOWN_SIZE:
        if len(data) < size:
            raise ValueError(f"AU data holds {len(data)} B < header's {size}")
        data = data[:size]
    if enc == _ENC_ULAW:
        from simsearch_spark.multimodal.g711 import ulaw_decode

        return rate, channels, [ulaw_decode(b) for b in data]
    if enc == _ENC_ALAW:
        from simsearch_spark.multimodal.g711 import alaw_decode

        return rate, channels, [alaw_decode(b) for b in data]
    if enc == _ENC_PCM16:
        n = len(data) // 2
        return rate, channels, list(struct.unpack(f">{n}h", data[: n * 2]))
    if enc == _ENC_PCM8:
        # AU 8-bit is SIGNED linear (the spec's difference from WAV)
        return rate, channels, [
            v << 8 for v in struct.unpack(f">{len(data)}b", data)
        ]
    if enc == _ENC_PCM24:
        n = len(data) // 3
        return rate, channels, [
            int.from_bytes(data[3 * i : 3 * i + 3], "big", signed=True) >> 8
            for i in range(n)
        ]
    if enc == _ENC_PCM32:
        n = len(data) // 4
        return rate, channels, [
            v >> 16 for v in struct.unpack(f">{n}i", data[: n * 4])
        ]
    if enc in (_ENC_FLOAT32, _ENC_FLOAT64):
        from simsearch_spark.multimodal.pcm import float_to_int16

        width = 4 if enc == _ENC_FLOAT32 else 8
        n = len(data) // width
        vals = struct.unpack(f">{n}{'f' if width == 4 else 'd'}", data[: n * width])
        return rate, channels, [float_to_int16(v) for v in vals]
    # PERMANENT pin (r13): encodings 23-26 are the G.721/G.723 (G.726)
    # ADPCM family — a full adaptive pole/zero predictor recommendation,
    # not a table lookup; out of scope by the arithmetic-JPEG-decline
    # rationale (a large stateful spec with no bounded verification
    # vector in-container).  Everything else AU defines is covered.
    raise NotImplementedError(
        f"AU encoding {enc} (G.711 / PCM-16 / IEEE-float implemented; "
        "the G.721/G.723 ADPCM family is a declined seam)"
    )
