"""Dependency-free WAV (RIFF) codec — real audio decode for the
multimodal surface using only stdlib ``struct``.

Scope: PCM 16-bit little-endian (format tag 1), μ-law (tag 7) and A-law
(tag 6) telephony bytes via the G.711 companding module
(multimodal/g711.py, r10) — any sample rate / channel count.  Other
format tags and PCM bit depths raise ``NotImplementedError`` — the
explicit-seam contract shared with ``multimodal/png.py``.  Companded
streams decode to int16 samples, so downstream consumers (``audio_stats``
in ``multimodal/binary.py``) are codec-blind.  The reference engine has
no audio operators (LLM-pipeline extension surface).
"""

from __future__ import annotations

import struct

_TAG_PCM = 1
_TAG_ALAW = 6
_TAG_ULAW = 7


def encode_wav(
    samples: list[int], sample_rate: int, channels: int = 1, codec: str = "pcm16"
) -> bytes:
    """Interleaved int16 samples → RIFF/WAVE bytes.  codec: ``pcm16``
    (tag 1, 16-bit), ``ulaw`` / ``alaw`` (tags 7 / 6, G.711-companded to
    8-bit — lossy unless every sample sits on a representable level)."""
    if codec == "pcm16":
        tag, width = _TAG_PCM, 2
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif codec == "ulaw":
        from simsearch_spark.multimodal.g711 import ulaw_encode

        tag, width = _TAG_ULAW, 1
        data = bytes(ulaw_encode(int(s)) for s in samples)
    elif codec == "alaw":
        from simsearch_spark.multimodal.g711 import alaw_encode

        tag, width = _TAG_ALAW, 1
        data = bytes(alaw_encode(int(s)) for s in samples)
    else:
        raise ValueError(f"unknown WAV codec {codec!r}")
    byte_rate = sample_rate * channels * width
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, byte_rate, channels * width, width * 8
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) & 1:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """RIFF/WAVE bytes → (sample_rate, channels, interleaved int16
    samples).  PCM-16 passes through; μ-law/A-law bytes expand through
    the G.711 closed forms.  Raises ``ValueError`` on malformed
    containers, ``NotImplementedError`` on unsupported encodings."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = tag = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            try:
                tag, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            except struct.error as e:  # truncated fmt chunk
                raise ValueError(f"malformed fmt chunk: {e}") from e
            if tag not in (_TAG_PCM, _TAG_ALAW, _TAG_ULAW):
                raise NotImplementedError(
                    f"WAV format tag {tag} (PCM / G.711 a-law / u-law only)"
                )
            if tag == _TAG_PCM and bits != 16:
                raise NotImplementedError(f"WAV bit depth {bits} (16-bit PCM only)")
            if tag in (_TAG_ALAW, _TAG_ULAW) and bits != 8:
                raise ValueError(f"G.711 WAV with bit depth {bits} (must be 8)")
            # a parseable-but-degenerate fmt chunk must surface as a normal
            # decode failure (callers' bounded-exception contract), not as a
            # ZeroDivisionError in downstream duration math (ADVICE r6)
            if rate == 0 or channels == 0:
                raise ValueError(
                    f"degenerate fmt chunk: sample_rate={rate} channels={channels}"
                )
        elif cid == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV without fmt/data chunk")
    if tag == _TAG_ULAW:
        from simsearch_spark.multimodal.g711 import ulaw_decode

        return rate, channels, [ulaw_decode(b) for b in data]
    if tag == _TAG_ALAW:
        from simsearch_spark.multimodal.g711 import alaw_decode

        return rate, channels, [alaw_decode(b) for b in data]
    n = len(data) // 2
    return rate, channels, list(struct.unpack(f"<{n}h", data[: n * 2]))
