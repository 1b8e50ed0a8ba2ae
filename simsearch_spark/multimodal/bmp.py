"""BMP (Windows device-independent bitmap) codec — the simplest real-world
image container: a BITMAPFILEHEADER + the same BITMAPINFOHEADER/BI_RGB
pixel layout the AVI raw-video path already decodes (multimodal/avi.py
``decode_dib_frame``).  From scratch, dependency-free; public spec
(Windows BMP file format).  The reference engine has no media operators
(LLM-pipeline surface, SURVEY.md §6).

Scope: uncompressed (BI_RGB) 24-bit and 8-bit-grayscale-palette bitmaps,
bottom-up rows (positive biHeight).  Named seams: compressed biCompression
values, other bit depths, top-down bitmaps.  Lossless, so closed-form
pixel oracles are codec-invariant.
"""

from __future__ import annotations

import struct

from simsearch_spark.multimodal.avi import decode_dib_frame

__all__ = ["encode_bmp", "decode_bmp", "parse_bmp_header"]


def parse_bmp_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the BITMAPINFOHEADER — the metadata sniff."""
    if len(data) < 26 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    w, h = struct.unpack("<ii", data[18:26])
    return int(w), abs(int(h))


def encode_bmp(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Top-down row-major pixels → BMP bytes.  channels=3 writes BI_RGB
    24-bit (rows flipped bottom-up, BGR, 4-byte stride); channels=1 writes
    an 8-bit bitmap with the 256-entry gray palette."""
    if channels not in (1, 3):
        raise ValueError(f"BMP encode supports 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}x{channels}")
    if channels == 3:
        stride = (width * 3 + 3) & ~3
        palette = b""
        bits = 24
        rows = bytearray()
        for y in range(height - 1, -1, -1):
            row = bytearray()
            for x in range(width):
                r, g, b = pixels[3 * (y * width + x) : 3 * (y * width + x) + 3]
                row += bytes((b, g, r))
            row += b"\x00" * (stride - len(row))
            rows += row
    else:
        stride = (width + 3) & ~3
        palette = b"".join(bytes((v, v, v, 0)) for v in range(256))
        bits = 8
        rows = bytearray()
        for y in range(height - 1, -1, -1):
            row = bytearray(pixels[y * width : (y + 1) * width])
            row += b"\x00" * (stride - len(row))
            rows += row
    off = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bits, 0, stride * height, 2835, 2835,
        256 if channels == 1 else 0, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    return file_hdr + info + palette + bytes(rows)


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) — 24-bit BI_RGB via the shared
    DIB row decoder, 8-bit through its palette (gray palettes collapse to
    1 channel, like GIF)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h, _planes, bits = struct.unpack("<IiiHH", data[14:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size} (BITMAPINFOHEADER+ only)")
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} (BI_RGB only)")
    if h < 0:
        raise NotImplementedError("top-down BMP not supported")
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP geometry {w}x{h}")
    body = data[off:]
    if bits == 24:
        return w, h, 3, decode_dib_frame(body, w, h)
    if bits == 8:
        n_colors = struct.unpack("<I", data[46:50])[0] or 256
        pal = data[14 + hdr_size : 14 + hdr_size + 4 * n_colors]
        if len(pal) < 4 * n_colors:
            raise ValueError("truncated BMP palette")
        stride = (w + 3) & ~3
        if len(body) < stride * h:
            raise ValueError(f"BMP pixel data {len(body)} B < {stride}x{h} layout")
        idx = bytearray(w * h)
        for y in range(h):
            src = (h - 1 - y) * stride
            idx[y * w : (y + 1) * w] = body[src : src + w]
        used = set(idx)
        bad = [i for i in used if i >= n_colors]
        if bad:
            raise ValueError(f"palette index {max(bad)} outside {n_colors}-entry table")
        # palette entries are BGRX; gray when B==G==R over referenced entries
        if all(pal[4 * i] == pal[4 * i + 1] == pal[4 * i + 2] for i in used):
            lut = bytes(pal[4 * i] for i in range(n_colors))
            return w, h, 1, bytes(lut[i] for i in idx)
        out = bytearray(3 * w * h)
        for p, i in enumerate(idx):
            out[3 * p : 3 * p + 3] = bytes(
                (pal[4 * i + 2], pal[4 * i + 1], pal[4 * i])
            )
        return w, h, 3, bytes(out)
    raise NotImplementedError(f"BMP bit depth {bits} (8/24 only)")
