"""Dependency-free WAV (RIFF PCM) codec — real audio decode for the
multimodal surface using only stdlib ``struct``.

Scope: PCM 16-bit little-endian, any sample rate / channel count.
Compressed encodings (format tag != 1) and other bit depths raise
``NotImplementedError`` — the explicit-seam contract shared with
``multimodal/png.py``.  Decode feeds ``audio_stats`` in
``multimodal/binary.py``; the reference engine has no audio operators
(LLM-pipeline extension surface).
"""

from __future__ import annotations

import struct


def encode_wav(samples: list[int], sample_rate: int, channels: int = 1) -> bytes:
    """Interleaved int16 samples → RIFF/WAVE PCM bytes."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """RIFF/WAVE PCM bytes → (sample_rate, channels, interleaved int16
    samples).  Raises ``ValueError`` on malformed containers,
    ``NotImplementedError`` on non-PCM-16 encodings."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = None
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
            if tag != 1:
                raise NotImplementedError(f"WAV format tag {tag} (PCM only)")
            if bits != 16:
                raise NotImplementedError(f"WAV bit depth {bits} (16-bit only)")
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
    n = len(data) // 2
    return rate, channels, list(struct.unpack(f"<{n}h", data[: n * 2]))
