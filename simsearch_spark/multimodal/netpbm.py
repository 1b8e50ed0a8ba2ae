"""Dependency-free Netpbm codec (PGM P2/P5 gray, PPM P3/P6 RGB), r12 —
the plainest real image format, still everywhere in vision corpora.

Scope: binary (P5/P6) and ASCII (P2/P3) variants, maxval ≤ 255,
whitespace/comment-tolerant headers per the netpbm format specs.  PBM
bitmaps (P1/P4) and 16-bit maxvals raise ``NotImplementedError`` — the
explicit-seam contract shared with the sibling codecs.  Lossless, so the
closed-form pixel oracles are codec-invariant.  The reference engine has
no media operators (LLM-pipeline extension surface).
"""

from __future__ import annotations

__all__ = ["encode_netpbm", "decode_netpbm", "parse_netpbm_header"]

_CHANNELS = {b"P2": 1, b"P5": 1, b"P3": 3, b"P6": 3}


def _tokens(data: bytes, n: int, pos: int) -> tuple[list[bytes], int]:
    """Read ``n`` whitespace-separated tokens starting at ``pos``,
    skipping ``#`` comments (legal anywhere in the header per spec)."""
    out: list[bytes] = []
    i = pos
    while len(out) < n:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i] == ord("#"):
            while i < len(data) and data[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        out.append(data[i:j])
        i = j
    return out, i


def parse_netpbm_header(data: bytes) -> tuple[int, int]:
    """(width, height) — the metadata sniff."""
    _m, w, h, _mx, _pos = _header(data)
    return w, h


def _header(data: bytes) -> tuple[bytes, int, int, int, int]:
    magic = data[:2]
    if magic in (b"P1", b"P4"):
        raise NotImplementedError("PBM bitmaps (P1/P4) not supported")
    if magic not in _CHANNELS:
        raise ValueError("not a netpbm payload")
    toks, pos = _tokens(data, 3, 2)
    w, h, mx = (int(t) for t in toks)
    if w <= 0 or h <= 0 or mx <= 0:
        raise ValueError(f"degenerate netpbm header {w}x{h} maxval {mx}")
    if mx > 255:
        raise NotImplementedError(f"netpbm maxval {mx} (8-bit only)")
    return magic, w, h, mx, pos


def decode_netpbm(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, row-major 8-bit pixels).  Values scale
    by 255/maxval (integer-exact when maxval is 255 — the common case the
    fixtures use; non-255 maxvals scale with round-half-away like the
    spec's reference implementation)."""
    magic, w, h, mx, pos = _header(data)
    ch = _CHANNELS[magic]
    n = w * h * ch
    if magic in (b"P5", b"P6"):
        # exactly ONE whitespace byte separates maxval from raster
        raster = data[pos + 1 : pos + 1 + n]
        if len(raster) != n:
            raise ValueError(f"netpbm raster holds {len(raster)} B != {n}")
        vals = list(raster)
    else:
        toks, _end = _tokens(data, n, pos)
        vals = [int(t) for t in toks]
    if any(v > mx for v in vals):
        raise ValueError("netpbm sample exceeds maxval")
    if mx != 255:
        vals = [(v * 255 * 2 + mx) // (2 * mx) for v in vals]
    return w, h, ch, bytes(vals)


def encode_netpbm(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    ascii_variant: bool = False,
) -> bytes:
    """Row-major 8-bit pixels → P5/P6 (binary) or P2/P3 (ASCII)."""
    if channels not in (1, 3):
        raise ValueError(f"netpbm supports 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    if ascii_variant:
        magic = b"P2" if channels == 1 else b"P3"
        body = b"\n".join(
            b" ".join(str(v).encode() for v in pixels[i : i + width * channels])
            for i in range(0, len(pixels), width * channels)
        )
        return magic + b"\n%d %d\n255\n" % (width, height) + body + b"\n"
    magic = b"P5" if channels == 1 else b"P6"
    return magic + b"\n%d %d\n255\n" % (width, height) + pixels
