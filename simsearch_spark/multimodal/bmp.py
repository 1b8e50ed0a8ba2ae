"""BMP (Windows device-independent bitmap) codec — the simplest real-world
image container: a BITMAPFILEHEADER + the same BITMAPINFOHEADER/BI_RGB
pixel layout the AVI raw-video path already decodes (multimodal/avi.py
``decode_dib_frame``).  From scratch, dependency-free; public spec
(Windows BMP file format).  The reference engine has no media operators
(LLM-pipeline surface, SURVEY.md §6).

Scope: uncompressed (BI_RGB) 24-bit and 8-bit-grayscale-palette bitmaps,
bottom-up rows (positive biHeight), and BI_RLE8 run-length-compressed
8-bit bitmaps (r12 — encoded runs, absolute literal runs with word
padding, end-of-line/end-of-bitmap markers, delta moves with the
conventional zero fill).  Named seams: other biCompression values, other
bit depths, top-down bitmaps.  Lossless, so closed-form pixel oracles
are codec-invariant.
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


def encode_bmp(
    width: int, height: int, channels: int, pixels: bytes, rle: bool = False
) -> bytes:
    """Top-down row-major pixels → BMP bytes.  channels=3 writes BI_RGB
    24-bit (rows flipped bottom-up, BGR, 4-byte stride); channels=1 writes
    an 8-bit bitmap with the 256-entry gray palette — BI_RLE8-compressed
    when ``rle=True`` (r12)."""
    if channels not in (1, 3):
        raise ValueError(f"BMP encode supports 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}x{channels}")
    if rle and channels != 1:
        raise ValueError("BI_RLE8 applies to 8-bit bitmaps only")
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
        palette = b"".join(bytes((v, v, v, 0)) for v in range(256))
        bits = 8
        if rle:
            rows = bytearray(_rle8_encode(pixels, width, height))
        else:
            stride = (width + 3) & ~3
            rows = bytearray()
            for y in range(height - 1, -1, -1):
                row = bytearray(pixels[y * width : (y + 1) * width])
                row += b"\x00" * (stride - len(row))
                rows += row
    comp = 1 if rle else 0
    off = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bits, comp, len(rows), 2835, 2835,
        256 if channels == 1 else 0, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    return file_hdr + info + palette + bytes(rows)


def _rle8_decode(body: bytes, w: int, h: int) -> bytes:
    """BI_RLE8 stream → top-down w×h palette indices.  Grammar (Windows
    BMP spec): ``n>0, v`` = n copies of v; ``0,0`` = end of line;
    ``0,1`` = end of bitmap; ``0,2,dx,dy`` = move right/up (skipped
    pixels take the conventional 0 fill); ``0,n≥3`` = n literal bytes,
    word-padded.  Rows run bottom-up like every BI_* layout."""
    idx = bytearray(w * h)
    x = y = 0  # y counts from the BOTTOM row
    i = 0
    while i + 1 < len(body):
        n, v = body[i], body[i + 1]
        i += 2
        if n > 0:
            if x + n > w or y >= h:
                raise ValueError("RLE8 run outside the bitmap")
            row = h - 1 - y
            idx[row * w + x : row * w + x + n] = bytes([v]) * n
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return bytes(idx)
        elif v == 2:  # delta
            if i + 2 > len(body):
                raise ValueError("truncated RLE8 delta")
            x, y = x + body[i], y + body[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("RLE8 delta outside the bitmap")
        else:  # absolute literal run of v bytes, word-aligned
            if i + v > len(body):
                raise ValueError("truncated RLE8 literal run")
            if x + v > w or y >= h:
                raise ValueError("RLE8 literal run outside the bitmap")
            row = h - 1 - y
            idx[row * w + x : row * w + x + v] = body[i : i + v]
            x += v
            i += v + (v & 1)
    raise ValueError("RLE8 stream without an end-of-bitmap marker")


def _rle8_encode(idx: bytes, w: int, h: int) -> bytes:
    """Top-down indices → BI_RLE8 (maximal encoded runs, EOL per row)."""
    out = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = idx[y * w : (y + 1) * w]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            out += bytes((run, row[x]))
            x += run
        out += b"\x00\x00"
    out += b"\x00\x01"
    return bytes(out)


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) — 24-bit BI_RGB via the shared
    DIB row decoder, 8-bit through its palette (gray palettes collapse to
    1 channel, like GIF), BI_RLE8 through the run-length decoder."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h, _planes, bits = struct.unpack("<IiiHH", data[14:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size} (BITMAPINFOHEADER+ only)")
    if comp not in (0, 1):
        raise NotImplementedError(f"BMP compression {comp} (BI_RGB / BI_RLE8 only)")
    if comp == 1 and bits != 8:
        raise ValueError(f"BI_RLE8 with bit depth {bits} (must be 8)")
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
        if comp == 1:
            idx = bytearray(_rle8_decode(body, w, h))
        else:
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
