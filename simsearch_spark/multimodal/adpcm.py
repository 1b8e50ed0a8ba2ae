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

Block layouts (Microsoft tag-0x11 registration): MONO — one 4-byte
header (int16 predictor, step index, reserved) then nibble pairs packed
low-first; STEREO (r11) — one header per channel, then the data
interleaves 4-BYTE GROUPS per channel (8 samples of the left channel,
8 of the right, repeating), de-interleaved to L/R/L/R sample order.
"""

from __future__ import annotations

import struct

__all__ = [
    "ima_raw_encode",
    "ima_raw_decode",
    "ima_wav_encode_block",
    "ima_wav_decode_block",
    "ima_qt_encode",
    "ima_qt_decode",
    "ima_qt_encode_packet",
    "ima_qt_decode_packet",
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


def ima_wav_encode_block_stereo(
    samples: list[int], indexes: tuple[int, int] = (0, 0)
) -> tuple[bytes, tuple[int, int]]:
    """One stereo block from INTERLEAVED L/R samples: per-channel 4-byte
    headers, then alternating 4-byte nibble groups (8 samples per channel
    per group).  ``len(samples)/2 - 1`` must be a multiple of 8 (whole
    groups); returns (block, final per-channel step indexes)."""
    if len(samples) < 2 or len(samples) & 1:
        raise ValueError("stereo ADPCM block needs interleaved L/R samples")
    chans = [samples[0::2], samples[1::2]]
    n = len(chans[0])
    if (n - 1) % 8:
        raise ValueError("stereo tag-0x11 block needs 1 + 8k samples per channel")
    out = bytearray()
    states = []
    for ch, idx in zip(chans, indexes):
        pred = _clamp16(int(ch[0]))
        out += struct.pack("<hBB", pred, _clamp_index(int(idx)), 0)
        states.append((pred, _clamp_index(int(idx))))
    for g in range((n - 1) // 8):
        for c in (0, 1):
            pred, idx = states[c]
            lo = None
            for s in chans[c][1 + 8 * g : 1 + 8 * (g + 1)]:
                nib, pred, idx = encode_sample(int(s), pred, idx)
                if lo is None:
                    lo = nib
                else:
                    out.append(lo | (nib << 4))
                    lo = None
            states[c] = (pred, idx)
    return bytes(out), (states[0][1], states[1][1])


def ima_wav_decode_block_stereo(block: bytes) -> list[int]:
    """One stereo block → INTERLEAVED L/R int16 samples (the two header
    predictors first)."""
    if len(block) < 8:
        raise ValueError("truncated stereo ADPCM block header")
    states = []
    for c in (0, 1):
        pred, index, _r = struct.unpack("<hBB", block[4 * c : 4 * c + 4])
        if index > 88:
            raise ValueError(f"ADPCM step index {index} > 88")
        states.append((pred, index))
    body = block[8:]
    if len(body) % 8:
        raise ValueError("stereo ADPCM data must be whole 4-byte channel groups")
    chans: list[list[int]] = [[states[0][0]], [states[1][0]]]
    for g in range(len(body) // 8):
        for c in (0, 1):
            pred, idx = states[c]
            for byte in body[8 * g + 4 * c : 8 * g + 4 * (c + 1)]:
                for nib in (byte & 0xF, (byte >> 4) & 0xF):
                    pred, idx = decode_nibble(nib, pred, idx)
                    chans[c].append(pred)
            states[c] = (pred, idx)
    out: list[int] = []
    for left, right in zip(chans[0], chans[1]):
        out += [left, right]
    return out


# -----------------------------------------------------------------------------
# Apple/QuickTime 'ima4' packets (AIFF-C compression type, r13)
# -----------------------------------------------------------------------------

#: QuickTime ima4 frame: 2-byte BE header + 32 nibble-pair bytes
IMA4_PACKET_BYTES = 34
IMA4_SAMPLES_PER_PACKET = 64


def ima_qt_encode_packet(
    samples: list[int], state: tuple[int, int]
) -> tuple[bytes, tuple[int, int]]:
    """One 34-byte ima4 packet for exactly 64 samples of one channel.
    The header checkpoints the RUNNING state (top 9 predictor bits |
    7-bit step index — the seek anchor QuickTime stores); nibbles pack
    LOW-first (the QT convention, opposite of audioop's raw stream) and
    run through the shared IMA quantizer."""
    if len(samples) != IMA4_SAMPLES_PER_PACKET:
        raise ValueError(f"ima4 packet takes 64 samples, got {len(samples)}")
    pred, index = state
    out = bytearray(struct.pack(">H", (pred & 0xFF80) | (index & 0x7F)))
    # the decoder restarts from the quantized header predictor — mirror
    # it here so encode/decode states stay in lockstep
    pred = _sext16(pred & 0xFF80)
    lo = None
    for s in samples:
        nib, pred, index = encode_sample(int(s), pred, index)
        if lo is None:
            lo = nib
        else:
            out.append((nib << 4) | lo)
            lo = None
    return bytes(out), (pred, index)


def ima_qt_decode_packet(packet: bytes) -> list[int]:
    """One ima4 packet → 64 int16 samples (state restarts from the
    header checkpoint, which is what makes packets seekable)."""
    if len(packet) != IMA4_PACKET_BYTES:
        raise ValueError(f"ima4 packet is 34 bytes, got {len(packet)}")
    (hdr,) = struct.unpack(">H", packet[:2])
    pred = _sext16(hdr & 0xFF80)
    index = _clamp_index(hdr & 0x7F)
    out: list[int] = []
    for byte in packet[2:]:
        for nib in (byte & 0x0F, byte >> 4):
            pred, index = decode_nibble(nib, pred, index)
            out.append(pred)
    return out


def _sext16(v: int) -> int:
    return v - 0x10000 if v & 0x8000 else v


def ima_qt_encode(samples: list[int], channels: int = 1) -> bytes:
    """Interleaved int16 samples → ima4 packet stream (per-channel
    34-byte packets, channel-interleaved per 64-sample frame group; the
    tail pads by holding the final sample — decoders trim to the COMM
    frame count)."""
    if channels not in (1, 2):
        raise ValueError(f"ima4 encode supports 1 or 2 channels, got {channels}")
    if len(samples) % channels:
        raise ValueError("interleaved sample count not divisible by channels")
    per = [samples[c::channels] for c in range(channels)]
    n = len(per[0])
    pad = (-n) % IMA4_SAMPLES_PER_PACKET
    if pad:
        for ch in per:
            ch.extend([ch[-1] if ch else 0] * pad)
    states = [(0, 0)] * channels
    out = bytearray()
    for base in range(0, n + pad, IMA4_SAMPLES_PER_PACKET):
        for c in range(channels):
            pkt, states[c] = ima_qt_encode_packet(
                per[c][base : base + IMA4_SAMPLES_PER_PACKET], states[c]
            )
            out += pkt
    return bytes(out)


def ima_qt_decode(data: bytes, channels: int = 1) -> list[int]:
    """ima4 packet stream → interleaved int16 samples (inverse layout of
    ``ima_qt_encode``; trailing partial packets are malformed)."""
    if channels not in (1, 2):
        raise ValueError(f"ima4 decode supports 1 or 2 channels, got {channels}")
    if len(data) % (IMA4_PACKET_BYTES * channels):
        raise ValueError(
            f"ima4 stream length {len(data)} not a whole packet group"
        )
    per: list[list[int]] = [[] for _ in range(channels)]
    pos = 0
    while pos < len(data):
        for c in range(channels):
            per[c].extend(ima_qt_decode_packet(data[pos : pos + IMA4_PACKET_BYTES]))
            pos += IMA4_PACKET_BYTES
    out: list[int] = []
    for i in range(len(per[0])):
        for c in range(channels):
            out.append(per[c][i])
    return out
