"""IMA/DVI ADPCM codec (WAV format tag 0x0011) — dependency-free, like
the sibling G.711 module.  Public specs: IMA Digital Audio Focus and
Technical Working Groups recommendation (1992, the "IMA ADPCM" 4-bit
coder) and Microsoft's multimedia registration of format tag 0x11
(block layout: per-block int16 predictor + step index header, then
nibble pairs packed LOW nibble first).

Verification strategy (the G.711 pattern): CPython's ``audioop``
implements the IDENTICAL Intel/DVI coder (``lin2adpcm``/``adpcm2lin``,
raw stateful stream, HIGH nibble first) — ``ima_raw_encode`` /
``ima_raw_decode`` below match it byte-for-byte and sample-for-sample on
randomized and structured inputs (tests/test_adpcm.py), pinning the step
table, index table, quantizer, and reconstruction arithmetic against an
independent reference implementation.  The WAV block layer then reuses
the verified core with the tag-0x11 packing (low nibble first, header
predictor emitted as the block's first sample).

The coder is LOSSY (4 bits/sample ≈ 4:1 vs int16), so unlike
G.711-at-representable-levels it cannot sit under a closed-form SQL
oracle; its guarantees live in pytest (exact cross-implementation
equality + reconstruction-error bounds).

Scope: mono (the fixture shape).  Stereo tag-0x11 interleaves 4-byte
nibble groups per channel — a named NotImplementedError seam.
"""

from __future__ import annotations

import struct

__all__ = [
    "ima_raw_encode",
    "ima_raw_decode",
    "ima_wav_encode_block",
    "ima_wav_decode_block",
    "STEP_TABLE",
    "INDEX_TABLE",
]

#: the 89-entry step-size table every IMA ADPCM implementation shares
#: (IMA recommendation table 2; identical constants in CPython audioop.c)
STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)

#: index adjustment per 3-bit magnitude (IMA table 1)
INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_index(i: int) -> int:
    return 0 if i < 0 else (88 if i > 88 else i)


def decode_nibble(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One reconstruction step: (new predictor, new index)."""
    step = STEP_TABLE[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = _clamp16(pred - diff if nibble & 8 else pred + diff)
    return pred, _clamp_index(index + INDEX_TABLE[nibble & 7])


def encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One quantization step: (nibble, new predictor, new index) — the
    IMA reference quantizer (successive step halving), identical to
    audioop's lin2adpcm inner loop."""
    step = STEP_TABLE[index]
    diff = sample - pred
    nibble = 8 if diff < 0 else 0
    if diff < 0:
        diff = -diff
    vpdiff = step >> 3
    if diff >= step:
        nibble |= 4
        diff -= step
        vpdiff += step
    step >>= 1
    if diff >= step:
        nibble |= 2
        diff -= step
        vpdiff += step
    step >>= 1
    if diff >= step:
        nibble |= 1
        vpdiff += step
    pred = _clamp16(pred - vpdiff if nibble & 8 else pred + vpdiff)
    return nibble, pred, _clamp_index(index + INDEX_TABLE[nibble & 7])


# -----------------------------------------------------------------------------
# raw stateful stream (audioop's shape: HIGH nibble first, no headers)
# -----------------------------------------------------------------------------


def ima_raw_encode(
    samples: list[int], state: tuple[int, int] = (0, 0)
) -> tuple[bytes, tuple[int, int]]:
    """audioop.lin2adpcm dual: byte-identical stream and final state."""
    pred, index = state
    out = bytearray()
    hi = None
    for s in samples:
        nib, pred, index = encode_sample(int(s), pred, index)
        if hi is None:
            hi = nib
        else:
            out.append((hi << 4) | nib)
            hi = None
    if hi is not None:
        out.append(hi << 4)
    return bytes(out), (pred, index)


def ima_raw_decode(
    data: bytes, state: tuple[int, int] = (0, 0)
) -> tuple[list[int], tuple[int, int]]:
    """audioop.adpcm2lin dual: sample-identical output and final state."""
    pred, index = state
    out: list[int] = []
    for byte in data:
        for nib in ((byte >> 4) & 0xF, byte & 0xF):
            pred, index = decode_nibble(nib, pred, index)
            out.append(pred)
    return out, (pred, index)


# -----------------------------------------------------------------------------
# WAV tag-0x11 block layer (mono): int16 predictor + index header,
# LOW nibble first
# -----------------------------------------------------------------------------


def ima_wav_encode_block(samples: list[int], index: int = 0) -> tuple[bytes, int]:
    """One mono block: the first sample becomes the header predictor
    (emitted verbatim), the rest encode as nibble pairs low-first.
    ``len(samples) - 1`` must be even (tag-0x11 blocks carry whole
    bytes).  Returns (block bytes, final step index) so consecutive
    blocks can chain their indexes the way real encoders do."""
    if not samples:
        raise ValueError("empty ADPCM block")
    if (len(samples) - 1) & 1:
        raise ValueError("tag-0x11 block needs an odd sample count (1 + 2k)")
    pred = _clamp16(int(samples[0]))
    index = _clamp_index(int(index))
    out = bytearray(struct.pack("<hBB", pred, index, 0))
    lo = None
    for s in samples[1:]:
        nib, pred, index = encode_sample(int(s), pred, index)
        if lo is None:
            lo = nib
        else:
            out.append(lo | (nib << 4))
            lo = None
    return bytes(out), index


def ima_wav_decode_block(block: bytes) -> list[int]:
    """One mono block → int16 samples (header predictor first)."""
    if len(block) < 4:
        raise ValueError("truncated ADPCM block header")
    pred, index, _reserved = struct.unpack("<hBB", block[:4])
    if index > 88:
        raise ValueError(f"ADPCM step index {index} > 88")
    out = [pred]
    for byte in block[4:]:
        for nib in (byte & 0xF, (byte >> 4) & 0xF):
            pred, index = decode_nibble(nib, pred, index)
            out.append(pred)
    return out
