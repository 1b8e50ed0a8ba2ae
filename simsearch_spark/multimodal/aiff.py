"""Dependency-free AIFF codec (Apple/EA IFF-85 audio, "Audio IFF 1.3"
spec) — the big-endian sibling of multimodal/wav.py, r12.

Scope: FORM/AIFF containers with COMM (channels, frame count, 16-bit
sample size, sample rate as an 80-bit IEEE-754 extended float — the SANE
format the spec mandates) and SSND (offset/blockSize headers honored)
chunks; PCM 16-bit BIG-endian samples.  Other sample sizes and
compressed AIFC raise ``NotImplementedError`` — the explicit-seam
contract shared with the sibling codecs.  Lossless, so the closed-form
audio oracles are container-invariant.  The reference engine has no
audio operators (LLM-pipeline extension surface).
"""

from __future__ import annotations

import struct

__all__ = ["encode_aiff", "decode_aiff"]


def _pack_extended(value: int) -> bytes:
    """Non-negative integer → 80-bit IEEE extended (1 sign, 15 exp bias
    16383, 64-bit mantissa with EXPLICIT leading 1) — exact for every
    integer below 2^64, which covers every sample rate."""
    if value < 0:
        raise ValueError("extended-float pack: negative rate")
    if value == 0:
        return bytes(10)
    k = value.bit_length() - 1
    return struct.pack(">HQ", 16383 + k, value << (63 - k))


def _unpack_extended(raw: bytes) -> int:
    """80-bit extended → nearest integer (sample rates are integral)."""
    se, mant = struct.unpack(">HQ", raw[:10])
    if se & 0x8000:
        raise ValueError("negative AIFF sample rate")
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0
    shift = exp - 16383 - 63
    return mant << shift if shift >= 0 else round(mant / (1 << -shift))


def encode_aiff(samples: list[int], sample_rate: int, channels: int = 1) -> bytes:
    """Interleaved int16 samples → FORM/AIFF bytes (PCM-16 BE)."""
    if channels < 1 or len(samples) % channels:
        raise ValueError("samples must hold whole frames")
    n_frames = len(samples) // channels
    data = struct.pack(f">{len(samples)}h", *samples)
    comm = struct.pack(">hLh", channels, n_frames, 16) + _pack_extended(
        int(sample_rate)
    )
    ssnd = struct.pack(">LL", 0, 0) + data  # offset, blockSize
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">L", len(comm)) + comm
        + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
    )
    if len(ssnd) & 1:  # IFF chunks are word-aligned
        body += b"\x00"
    return b"FORM" + struct.pack(">L", len(body)) + body


def decode_aiff(payload: bytes) -> tuple[int, int, list[int]]:
    """FORM/AIFF bytes → (sample_rate, channels, interleaved int16
    samples) — the ``decode_wav`` return contract."""
    if payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
        if payload[8:12] == b"AIFC":
            raise NotImplementedError("compressed AIFF-C not supported")
        raise ValueError("not a FORM/AIFF payload")
    pos = 12
    rate = channels = n_frames = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack(">L", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if cid == b"COMM":
            try:
                channels, n_frames, bits = struct.unpack(">hLh", body[:8])
                rate = _unpack_extended(body[8:18])
            except struct.error as e:
                raise ValueError(f"malformed COMM chunk: {e}") from e
            if bits != 16:
                raise NotImplementedError(f"AIFF sample size {bits} (16-bit only)")
            if rate == 0 or channels < 1:
                raise ValueError(
                    f"degenerate COMM chunk: rate={rate} channels={channels}"
                )
        elif cid == b"SSND":
            if len(body) < 8:
                raise ValueError("truncated SSND chunk")
            off, _blk = struct.unpack(">LL", body[:8])
            data = body[8 + off :]
    if rate is None or data is None:
        raise ValueError("AIFF without COMM/SSND chunk")
    want = n_frames * channels
    n = len(data) // 2
    samples = list(struct.unpack(f">{n}h", data[: n * 2]))
    if len(samples) < want:
        raise ValueError(f"SSND holds {len(samples)} samples < COMM's {want}")
    return rate, channels, samples[:want]
