"""Dependency-free WAV (RIFF) codec — real audio decode for the
multimodal surface using only stdlib ``struct``.

Scope: integer PCM at 8/16/24/32 bits little-endian (format tag 1 —
widths other than 16 reduce to the int16 contract: unsigned 8-bit
re-centers on 128, wider widths keep their top 16 bits, r12), IEEE
float32/float64 (tag 3, ±1.0 full scale — s/32768.0 is float32-exact
for every int16, r12), μ-law (tag 7) and A-law
(tag 6) telephony bytes via the G.711 companding module
(multimodal/g711.py, r10) — any sample rate / channel count — and MONO
IMA ADPCM (tag 0x11, multimodal/adpcm.py, r11 — the coder verified
byte-exactly against CPython's audioop; the block layer honors the fact
chunk's sample count), plus the WAVE_FORMAT_EXTENSIBLE wrapper (tag
0xFFFE, r12 — effective tag recovered from the SubFormat GUID, the
container modern writers emit even for plain PCM).  Other format tags
and PCM bit depths raise ``NotImplementedError`` — the explicit-seam
contract shared with ``multimodal/png.py``.  Companded/compressed streams decode to
int16 samples, so downstream consumers (``audio_stats`` in
``multimodal/binary.py``) are codec-blind.  The reference engine has no
audio operators (LLM-pipeline extension surface).
"""

from __future__ import annotations

import struct

_TAG_PCM = 1
_TAG_FLOAT = 3
_TAG_ALAW = 6
_TAG_ULAW = 7
_TAG_IMA_ADPCM = 0x11
_TAG_EXTENSIBLE = 0xFFFE
#: the fixed 14-byte tail every KSDATAFORMAT_SUBTYPE_* GUID shares — the
#: leading 2 bytes are the effective format tag (Microsoft multichannel
#: audio spec, r12)
_GUID_TAIL = bytes(
    [0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
)


def encode_wav(
    samples: list[int],
    sample_rate: int,
    channels: int = 1,
    codec: str = "pcm16",
    extensible: bool = False,
) -> bytes:
    """Interleaved int16 samples → RIFF/WAVE bytes.  codec: ``pcm16``
    (tag 1, 16-bit), ``ulaw`` / ``alaw`` (tags 7 / 6, G.711-companded to
    8-bit — lossy unless every sample sits on a representable level).
    ``extensible=True`` (pcm16 only) wraps the format in
    WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE + 22-byte extension carrying the
    PCM subformat GUID) — the container modern multichannel writers emit
    even for plain PCM (r12)."""
    if extensible and codec != "pcm16":
        raise ValueError("extensible wrapper implemented for pcm16 only")
    if codec == "pcm16":
        tag, width = _TAG_PCM, 2
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif codec == "pcm8":
        # unsigned 8-bit: keeps the high byte — exact iff s % 256 == 0
        tag, width = _TAG_PCM, 1
        data = bytes(((int(s) >> 8) + 128) & 0xFF for s in samples)
    elif codec == "pcm24":
        # int16 widened into the top bytes — always exact
        tag, width = _TAG_PCM, 3
        data = b"".join(
            (int(s) << 8).to_bytes(3, "little", signed=True) for s in samples
        )
    elif codec == "pcm32":
        tag, width = _TAG_PCM, 4
        data = struct.pack(f"<{len(samples)}i", *(int(s) << 16 for s in samples))
    elif codec in ("float32", "float64"):
        # IEEE float (tag 3): s/32768.0 is exact in float32 for any int16
        tag, width = _TAG_FLOAT, 4 if codec == "float32" else 8
        fmt = "f" if codec == "float32" else "d"
        data = struct.pack(
            f"<{len(samples)}{fmt}", *(int(s) / 32768.0 for s in samples)
        )
    elif codec == "ulaw":
        from simsearch_spark.multimodal.g711 import ulaw_encode

        tag, width = _TAG_ULAW, 1
        data = bytes(ulaw_encode(int(s)) for s in samples)
    elif codec == "alaw":
        from simsearch_spark.multimodal.g711 import alaw_encode

        tag, width = _TAG_ALAW, 1
        data = bytes(alaw_encode(int(s)) for s in samples)
    elif codec == "ima_adpcm":
        from simsearch_spark.multimodal.adpcm import (
            ima_wav_encode_block,
            ima_wav_encode_block_stereo,
        )

        if channels not in (1, 2):
            raise NotImplementedError("IMA ADPCM WAV: mono or stereo only")
        tag = _TAG_IMA_ADPCM
        if channels == 1:
            block_align = 256
            spb = (block_align - 4) * 2 + 1  # samples per block
            chunks, index = [], 0
            for i in range(0, len(samples), spb):
                blk = [int(s) for s in samples[i : i + spb]]
                if len(blk) > 1 and (len(blk) - 1) & 1:
                    blk.append(blk[-1])  # pad to whole bytes; fact chunk trims
                block, index = ima_wav_encode_block(blk, index)
                chunks.append(block)
            n_frames = len(samples)
        else:
            block_align = 512
            spb = (block_align - 8) // 8 * 8 + 1  # 505 frames per block
            if len(samples) & 1:
                raise ValueError("stereo samples must interleave L/R pairs")
            chunks, idxs = [], (0, 0)
            for i in range(0, len(samples), 2 * spb):
                blk = [int(s) for s in samples[i : i + 2 * spb]]
                frames = len(blk) // 2
                pad = (-(frames - 1)) % 8  # whole 8-frame groups; fact trims
                blk = blk + blk[-2:] * pad
                block, idxs = ima_wav_encode_block_stereo(blk, idxs)
                chunks.append(block)
            n_frames = len(samples) // 2
        data = b"".join(chunks)
        fmt = struct.pack(
            "<HHIIHHHH",
            tag, channels, sample_rate,
            sample_rate * block_align // spb,  # nominal byte rate
            block_align, 4,  # bits per (compressed) sample
            2, spb,          # cbSize, wSamplesPerBlock
        )
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, n_frames)
            + b"data" + struct.pack("<I", len(data)) + data
        )
        if len(data) & 1:
            body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body
    else:
        raise ValueError(f"unknown WAV codec {codec!r}")
    byte_rate = sample_rate * channels * width
    if extensible:
        fmt = struct.pack(
            "<HHIIHHHHI",
            _TAG_EXTENSIBLE, channels, sample_rate, byte_rate,
            channels * width, width * 8,
            22,          # cbSize
            width * 8,   # wValidBitsPerSample
            0,           # dwChannelMask (unspecified)
        ) + struct.pack("<H", tag) + _GUID_TAIL
    else:
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
    block_align = 0
    n_fact = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            try:
                tag, channels, rate, _br, block_align, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
            except struct.error as e:  # truncated fmt chunk
                raise ValueError(f"malformed fmt chunk: {e}") from e
            if tag == _TAG_EXTENSIBLE:
                # WAVE_FORMAT_EXTENSIBLE (r12): the effective tag lives in
                # the SubFormat GUID's first two bytes; the remaining 14
                # must be the shared KSDATAFORMAT tail
                if len(body) < 40:
                    raise ValueError("extensible fmt chunk shorter than 40 bytes")
                (tag,) = struct.unpack("<H", body[24:26])
                if body[26:40] != _GUID_TAIL:
                    raise ValueError("extensible WAV with unrecognized SubFormat GUID")
            if tag not in (
                _TAG_PCM, _TAG_FLOAT, _TAG_ALAW, _TAG_ULAW, _TAG_IMA_ADPCM
            ):
                # PERMANENT pin (r14): perceptual-codec tags (MP3 0x55,
                # AAC, WMA, …) are out of scope by spec size and
                # patent-era complexity — loud seam, never a misdecode
                raise NotImplementedError(
                    f"WAV format tag {tag} (PCM / float / G.711 / IMA ADPCM only)"
                )
            if tag == _TAG_PCM and bits not in (8, 16, 24, 32):
                raise NotImplementedError(
                    f"WAV bit depth {bits} (8/16/24/32-bit integer PCM only)"
                )
            if tag == _TAG_FLOAT and bits not in (32, 64):
                raise ValueError(f"float WAV with bit depth {bits} (32/64)")
            if tag in (_TAG_ALAW, _TAG_ULAW) and bits != 8:
                raise ValueError(f"G.711 WAV with bit depth {bits} (must be 8)")
            if tag == _TAG_IMA_ADPCM:
                if channels not in (1, 2):
                    raise NotImplementedError("IMA ADPCM WAV: mono or stereo only")
                if bits != 4:
                    raise ValueError(f"IMA ADPCM WAV with bit depth {bits} (must be 4)")
                if block_align < 4 * channels + 1:
                    raise ValueError(f"IMA ADPCM block align {block_align} too small")
            # a parseable-but-degenerate fmt chunk must surface as a normal
            # decode failure (callers' bounded-exception contract), not as a
            # ZeroDivisionError in downstream duration math (ADVICE r6)
            if rate == 0 or channels == 0:
                raise ValueError(
                    f"degenerate fmt chunk: sample_rate={rate} channels={channels}"
                )
        elif cid == b"fact" and ln >= 4:
            (n_fact,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV without fmt/data chunk")
    if tag == _TAG_IMA_ADPCM:
        from simsearch_spark.multimodal.adpcm import (
            ima_wav_decode_block,
            ima_wav_decode_block_stereo,
        )

        dec = ima_wav_decode_block if channels == 1 else ima_wav_decode_block_stereo
        samples: list[int] = []
        for i in range(0, len(data), block_align):
            samples += dec(data[i : i + block_align])
        if n_fact is not None:
            samples = samples[: n_fact * channels]  # trim block padding
        return rate, channels, samples
    if tag == _TAG_ULAW:
        from simsearch_spark.multimodal.g711 import ulaw_decode

        return rate, channels, [ulaw_decode(b) for b in data]
    if tag == _TAG_ALAW:
        from simsearch_spark.multimodal.g711 import alaw_decode

        return rate, channels, [alaw_decode(b) for b in data]
    if tag == _TAG_FLOAT:
        # IEEE-float WAV (r12): full scale is ±1.0; s/32768.0 is exactly
        # representable in float32, so int16 round-trips losslessly
        from simsearch_spark.multimodal.pcm import float_to_int16

        n = len(data) // (bits // 8)
        vals = struct.unpack(f"<{n}{'f' if bits == 32 else 'd'}", data[: n * bits // 8])
        return rate, channels, [float_to_int16(v) for v in vals]
    # integer PCM (r12: 8/24/32-bit widths reduce to the int16 contract —
    # 8-bit is UNSIGNED per spec, midpoint 128; wider widths keep their
    # top 16 bits, the same high-byte reduction the 16-bit PNG path uses)
    if bits == 8:
        return rate, channels, [(b - 128) << 8 for b in data]
    if bits == 24:
        n = len(data) // 3
        samples = []
        for i in range(n):
            v = int.from_bytes(data[3 * i : 3 * i + 3], "little", signed=True)
            samples.append(v >> 8)
        return rate, channels, samples
    if bits == 32:
        n = len(data) // 4
        return rate, channels, [
            v >> 16 for v in struct.unpack(f"<{n}i", data[: n * 4])
        ]
    n = len(data) // 2
    return rate, channels, list(struct.unpack(f"<{n}h", data[: n * 2]))
