"""Dependency-free AVI (RIFF) container parser — real video FRAME INDEXING
for the multimodal surface using only stdlib ``struct``.

Scope: the container layer — locate the ``movi`` LIST and index its video
chunks (``..dc`` compressed / ``..db`` uncompressed), returning per-frame
(offset, size) into the payload plus the fps from the main AVI header.
Frame PIXEL decode stays a seam (MJPEG frames are JPEGs — entropy decode
needs a codec library), but frame counts, sampling plans, and per-frame
byte extraction are real: a sampler can slice exact frame payloads out of
the binary column with no decoder at all.

Same explicit-seam contract as multimodal/png.py / wav.py: malformed
containers raise ``ValueError``, never low-level struct errors.  The
reference engine has no video operators (LLM-pipeline extension surface).
"""

from __future__ import annotations

import struct

_US_PER_S = 1_000_000


def encode_avi_mjpeg(frames: list[bytes], fps: int = 25) -> bytes:
    """Minimal valid AVI wrapping ``frames`` as ``00dc`` video chunks —
    enough container structure for the parser (and any standard demuxer)
    to index: RIFF(AVI ) → LIST(hdrl: avih + LIST(strl: strh/strf)) →
    LIST(movi: 00dc…) → idx1."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", len(body) + 4) + kind + body

    n = len(frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        _US_PER_S // max(fps, 1), 0, 0, 0x10, n, 0, 1, 0, 0, 0, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, 16, 16, 1, 24, 0, 0, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx_entries = []
    off = 4  # idx1 offsets are relative to the start of 'movi'
    for f in frames:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_frames(payload: bytes) -> tuple[float, list[tuple[int, int]]]:
    """Parse an AVI container → (fps, [(absolute_offset, size), ...]) for
    every video frame chunk in stream order.  ``payload[off:off+size]`` IS
    the frame's compressed bytes.  Raises ``ValueError`` on malformed
    containers, never struct.error."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    fps = 0.0
    frames: list[tuple[int, int]] = []

    def walk(start: int, end: int) -> None:
        nonlocal fps
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            try:
                (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            except struct.error as e:
                raise ValueError(f"malformed chunk header at {pos}: {e}") from e
            body_start = pos + 8
            if body_start + ln > end:
                raise ValueError(f"chunk at {pos} overruns container")
            if cid == b"LIST":
                kind = payload[body_start : body_start + 4]
                if kind in (b"hdrl", b"movi", b"strl"):
                    walk(body_start + 4, body_start + ln)
            elif cid == b"avih":
                if ln < 4:
                    raise ValueError("malformed avih chunk")
                (us_per_frame,) = struct.unpack("<I", payload[body_start : body_start + 4])
                fps = _US_PER_S / us_per_frame if us_per_frame else 0.0
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                frames.append((body_start, ln))
            pos = body_start + ln + (ln & 1)  # word alignment

    walk(12, min(len(payload), 12 + struct.unpack("<I", payload[4:8])[0] - 4))
    return fps, frames
