"""Dependency-free AIFF codec (Apple/EA IFF-85 audio, "Audio IFF 1.3"
spec) — the big-endian sibling of multimodal/wav.py, r12.

Scope: FORM/AIFF containers with COMM (channels, frame count, 16-bit
sample size, sample rate as an 80-bit IEEE-754 extended float — the SANE
format the spec mandates) and SSND (offset/blockSize headers honored)
chunks; PCM 16-bit BIG-endian samples.  FORM/AIFC ("AIFF-C 1.0" draft)
adds the extended COMM with a compressionType (r12): ``NONE``/``twos``
(BE PCM), ``sowt`` (byte-swapped LE PCM — the QuickTime convention),
``fl32``/``FL32`` (IEEE float32 BE, ±1.0 full scale — s/32768.0 is
exact for every int16, so the round trip is lossless),
and the G.711 types ``ulaw``/``alaw`` through multimodal/g711.py.
Other sample sizes and compression types raise ``NotImplementedError``
— the explicit-seam contract shared with the sibling codecs.  The PCM
forms are lossless, so the closed-form audio oracles are
container-invariant.  The reference engine has no audio operators
(LLM-pipeline extension surface).
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


#: AIFC compression types → human-readable pascal-string names (spec
#: appendix); the keys double as the supported-decoder set.
_AIFC_NAMES = {
    b"NONE": b"not compressed",
    b"twos": b"not compressed",
    b"sowt": b"not compressed",
    b"ulaw": b"\xb5law 2:1",  # the spec's own name string
    b"alaw": b"Alaw 2:1",
    b"fl32": b"32-bit floating point",
    b"FL32": b"32-bit floating point",  # the SoundManager spelling
    b"ima4": b"IMA 4:1",  # QuickTime IMA ADPCM (r13, multimodal/adpcm.py)
}


def _pstring(s: bytes) -> bytes:
    """IFF pascal string: count byte + bytes, padded to EVEN total."""
    if len(s) > 255:
        raise ValueError("pstring too long")
    out = bytes([len(s)]) + s
    return out + (b"\x00" if len(out) & 1 else b"")


def encode_aiff(
    samples: list[int],
    sample_rate: int,
    channels: int = 1,
    aifc: str | None = None,
) -> bytes:
    """Interleaved int16 samples → FORM/AIFF bytes (PCM-16 BE); with
    ``aifc`` one of NONE/twos/sowt/ulaw/alaw, FORM/AIFC with the FVER
    chunk and the extended COMM (r12).  ulaw/alaw COMPAND the samples —
    exact only on the G.711-representable level set."""
    if channels < 1 or len(samples) % channels:
        raise ValueError("samples must hold whole frames")
    n_frames = len(samples) // channels
    ctype = aifc.encode() if aifc is not None else None
    if ctype is not None and ctype not in _AIFC_NAMES:
        raise ValueError(f"AIFC encode supports {sorted(_AIFC_NAMES)}, got {aifc}")
    if ctype == b"sowt":
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif ctype in (b"fl32", b"FL32"):
        # IEEE float32 BE: s/32768.0 is exact for any int16 (r12)
        data = struct.pack(f">{len(samples)}f", *(int(s) / 32768.0 for s in samples))
    elif ctype == b"ulaw":
        from simsearch_spark.multimodal.g711 import ulaw_encode

        data = bytes(ulaw_encode(s) for s in samples)
    elif ctype == b"alaw":
        from simsearch_spark.multimodal.g711 import alaw_encode

        data = bytes(alaw_encode(s) for s in samples)
    elif ctype == b"ima4":
        from simsearch_spark.multimodal.adpcm import ima_qt_encode

        data = ima_qt_encode([int(s) for s in samples], channels)
    else:
        data = struct.pack(f">{len(samples)}h", *samples)
    ss_bits = 32 if ctype in (b"fl32", b"FL32") else 16
    comm = struct.pack(">hLh", channels, n_frames, ss_bits) + _pack_extended(
        int(sample_rate)
    )
    if ctype is not None:
        comm += ctype + _pstring(_AIFC_NAMES[ctype])
    ssnd = struct.pack(">LL", 0, 0) + data  # offset, blockSize
    chunks = b""
    if ctype is not None:
        # FVER is mandatory in AIFC; the magic is the spec's timestamp
        chunks += b"FVER" + struct.pack(">LL", 4, 0xA2805140)
    chunks += b"COMM" + struct.pack(">L", len(comm)) + comm
    if len(comm) & 1:
        chunks += b"\x00"
    chunks += b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
    if len(ssnd) & 1:  # IFF chunks are word-aligned
        chunks += b"\x00"
    body = (b"AIFC" if ctype is not None else b"AIFF") + chunks
    return b"FORM" + struct.pack(">L", len(body)) + body


def decode_aiff(payload: bytes) -> tuple[int, int, list[int]]:
    """FORM/AIFF or FORM/AIFC bytes → (sample_rate, channels,
    interleaved int16 samples) — the ``decode_wav`` return contract.
    AIFC compression types NONE/twos (BE PCM), sowt (LE PCM), and
    ulaw/alaw (G.711) decode; anything else is a named seam."""
    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not a FORM/AIFF payload")
    is_aifc = payload[8:12] == b"AIFC"
    pos = 12
    rate = channels = n_frames = None
    ctype = b"NONE"
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
            if is_aifc:
                if len(body) < 22:
                    raise ValueError("AIFC COMM without compressionType")
                ctype = body[18:22]
                if ctype not in _AIFC_NAMES:
                    raise NotImplementedError(
                        f"AIFC compression {ctype!r} not supported"
                    )
            # G.711 stores 8-bit codes; writers record the ORIGINAL
            # (pre-companding) 16 or the stored 8 — accept both.  fl32
            # records its storage width, 32.
            ok_bits = (
                bits == 16
                or (ctype in (b"ulaw", b"alaw") and bits == 8)
                or (ctype in (b"fl32", b"FL32") and bits == 32)
                or (ctype == b"ima4" and bits in (4, 16))
            )
            if not ok_bits:
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
    if ctype in (b"fl32", b"FL32"):
        from simsearch_spark.multimodal.pcm import float_to_int16

        n = len(data) // 4
        vals = struct.unpack(f">{n}f", data[: n * 4])
        samples = [float_to_int16(v) for v in vals]
    elif ctype == b"ulaw":
        from simsearch_spark.multimodal.g711 import ulaw_decode

        samples = [ulaw_decode(b) for b in data]
    elif ctype == b"alaw":
        from simsearch_spark.multimodal.g711 import alaw_decode

        samples = [alaw_decode(b) for b in data]
    elif ctype == b"ima4":
        from simsearch_spark.multimodal.adpcm import ima_qt_decode

        samples = ima_qt_decode(bytes(data), channels)
    else:
        n = len(data) // 2
        endian = "<" if ctype == b"sowt" else ">"
        samples = list(struct.unpack(f"{endian}{n}h", data[: n * 2]))
    if len(samples) < want:
        raise ValueError(f"SSND holds {len(samples)} samples < COMM's {want}")
    return rate, channels, samples[:want]
