"""Dependency-free PNG codec (RFC 2083) — makes the multimodal decode seam
REAL for PNG payloads using only stdlib ``zlib``/``struct``.

Scope: every legal bit depth — 8-bit natively, 16-bit via the high-byte
reduction (the TIFF-ColorMap convention), sub-byte 1/2/4 (MSB-first
packed, gray bit-replication scaling / palette indices) — for color types
greyscale(0) / RGB(2) / palette(3) / grey+alpha(4) / RGBA(6),
non-interlaced AND Adam7-interlaced (seven independently-filtered passes,
RFC 2083 §2.6; r12 closes the interlaced×sub-byte cell, so every legal
(depth × layout) combination decodes), all five scanline
filters (None/Sub/Up/Average/Paeth).  Anything else raises ``NotImplementedError``
with the offending parameter — the same explicit-seam contract the rest of
``multimodal/`` uses.  The encoder can apply any filter type per scanline,
which is how the tests drive every unfilter branch through round-trips.

This is the LLM-pipeline extension surface (the reference engine has no
media operators); decode feeds ``binary.pixel_stats`` /
``binary.extract_pixel_features`` over Arrow batches.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CT_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 pass grid (RFC 2083 §2.6): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_dims(width: int, height: int):
    """Per-pass (w, h) sub-image dimensions (0 for empty passes)."""
    return [
        (
            max(0, (width - x0 + dx - 1) // dx),
            max(0, (height - y0 + dy - 1) // dy),
        )
        for x0, y0, dx, dy in _ADAM7
    ]


def _chunk(typ: bytes, payload: bytes) -> bytes:
    body = typ + payload
    return struct.pack(">I", len(payload)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_line(ft: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        elif ft == 4:
            pred = _paeth(a, b, c)
        else:
            raise NotImplementedError(f"PNG filter type {ft}")
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def _unfilter_line(ft: int, line: bytearray, prev: bytes, bpp: int) -> bytearray:
    n = len(line)
    if ft == 0:
        return line
    if ft == 1:
        for i in range(bpp, n):
            line[i] = (line[i] + line[i - bpp]) & 0xFF
    elif ft == 2:
        for i in range(n):
            line[i] = (line[i] + prev[i]) & 0xFF
    elif ft == 3:
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
    elif ft == 4:
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
    else:
        raise NotImplementedError(f"PNG filter type {ft}")
    return line


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    filter_types: list[int] | int = 0,
    interlace: bool = False,
) -> bytes:
    """Encode row-major 8-bit ``pixels`` (len = width*height*channels) as a
    valid PNG.  ``filter_types`` is one type for every scanline or a
    per-row list — used by tests to exercise each unfilter;
    ``interlace=True`` writes the Adam7 seven-pass layout (each pass
    filtered independently)."""
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {stride}*{height}")
    raw = bytearray()
    if interlace:
        ftype = filter_types if isinstance(filter_types, int) else 0
        for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, _adam7_dims(width, height)):
            if pw == 0 or ph == 0:
                continue
            pstride = pw * channels
            prev = bytes(pstride)
            for j in range(ph):
                y = y0 + j * dy
                line = b"".join(
                    pixels[
                        (y * width + x0 + i * dx) * channels
                        : (y * width + x0 + i * dx + 1) * channels
                    ]
                    for i in range(pw)
                )
                raw.append(ftype)
                raw += _filter_line(ftype, line, prev, channels)
                prev = line
    else:
        fts = [filter_types] * height if isinstance(filter_types, int) else list(filter_types)
        prev = bytes(stride)
        for row in range(height):
            line = pixels[row * stride : (row + 1) * stride]
            raw.append(fts[row])
            raw += _filter_line(fts[row], line, prev, channels)
            prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ct, 0, 0, 1 if interlace else 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG payload to (width, height, channels, row-major 8-bit
    pixels).  Palette images are expanded to RGB; 16-bit samples reduce
    to their high byte.  Raises ``NotImplementedError`` for unsupported
    bit depths, ``ValueError`` for malformed containers."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    ct = 0
    plte = b""
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            try:
                width, height, depth, ct, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", payload
                )
            except struct.error as e:  # truncated chunk
                raise ValueError(f"malformed IHDR: {e}") from e
            if depth == 16 and ct == 3:
                raise ValueError("16-bit palette PNG is invalid (PLTE is 8-bit)")
            if depth in (1, 2, 4) and ct not in (0, 3):
                raise ValueError(f"PNG depth {depth} is gray/palette-only")
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"invalid PNG bit depth {depth}")
            if interlace not in (0, 1):
                raise ValueError(f"PNG interlace method {interlace}")
            if ct not in _CT_CHANNELS:
                raise ValueError(f"PNG color type {ct}")
        elif typ == b"PLTE":
            plte = payload
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("PNG without IHDR")
    if not idat:
        raise ValueError("PNG without IDAT (header-only payload)")
    channels = _CT_CHANNELS[ct]
    # filter distance is bytes per pixel, FLOOR 1 for sub-byte depths
    # (RFC 2083 §6.2); scanline byte width packs bits for depth < 8
    bpp = max(1, channels * depth // 8)
    stride = (width * channels * depth + 7) // 8
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt deflate stream must not escape as
        raise ValueError(f"malformed IDAT: {e}") from e  # a zlib.error
    if interlace == 1:
        # Adam7 (r11): seven independently-filtered sub-images, each
        # scanline carrying its own filter byte with the filter history
        # reset per pass; pixels scatter back onto the (x0+i·dx, y0+j·dy)
        # grid.  RFC 2083 §2.6 / §6.
        # a pass with zero width OR height has no scanlines at all (spec:
        # empty passes are completely absent from the stream); pass
        # scanlines PACK sub-byte samples (ceil(pw·depth/8) bytes,
        # pass-local padding bits)
        dims = _adam7_dims(width, height)
        expect = sum(
            ((pw * channels * depth + 7) // 8 + 1) * ph
            for pw, ph in dims
            if pw and ph
        )
        if len(raw) != expect:
            raise ValueError(f"IDAT stream {len(raw)} != {expect} (Adam7)")
        if depth < 8:
            # interlaced sub-byte (r12): unfilter each pass's PACKED
            # scanline with the 1-byte filter distance, unpack MSB-first
            # bit groups per pass line, scatter 8-bit SAMPLES (gray by
            # bit replication, palette keeps indices — expanded below)
            scale = 1 if ct == 3 else 255 // ((1 << depth) - 1)
            mask = (1 << depth) - 1
            per_byte = 8 // depth
            out = bytearray(width * height)
            p = 0
            for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, dims):
                if pw == 0 or ph == 0:
                    continue
                pstride = (pw * depth + 7) // 8
                prev = bytes(pstride)
                for j in range(ph):
                    ft = raw[p]
                    line = bytearray(raw[p + 1 : p + 1 + pstride])
                    p += 1 + pstride
                    line = _unfilter_line(ft, line, prev, 1)
                    y = y0 + j * dy
                    for i in range(pw):
                        byte = line[i // per_byte]
                        shift = 8 - depth * (i % per_byte + 1)
                        out[y * width + x0 + i * dx] = ((byte >> shift) & mask) * scale
                    prev = bytes(line)
            depth = 8  # samples now unpacked to one byte each — the
            # depth-16/<8 post-processing below must not run again
        else:
            out = bytearray(stride * height)
            p = 0
            for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, dims):
                if pw == 0 or ph == 0:
                    continue
                pstride = pw * bpp
                prev = bytes(pstride)
                for j in range(ph):
                    ft = raw[p]
                    line = bytearray(raw[p + 1 : p + 1 + pstride])
                    p += 1 + pstride
                    line = _unfilter_line(ft, line, prev, bpp)
                    y = y0 + j * dy
                    for i in range(pw):
                        x = x0 + i * dx
                        out[(y * width + x) * bpp : (y * width + x + 1) * bpp] = \
                            line[i * bpp : (i + 1) * bpp]
                    prev = bytes(line)
    else:
        if len(raw) != (stride + 1) * height:
            raise ValueError(f"IDAT stream {len(raw)} != {(stride + 1) * height}")
        out = bytearray()
        prev = bytes(stride)
        p = 0
        for _row in range(height):
            ft = raw[p]
            line = bytearray(raw[p + 1 : p + 1 + stride])
            p += 1 + stride
            line = _unfilter_line(ft, line, prev, bpp)
            out += line
            prev = bytes(line)
    if depth == 16:
        # 16-bit samples reduce to their HIGH byte — the same 8-bit
        # reduction convention as the TIFF ColorMap's >>8 (the module's
        # pixel surface is 8-bit by contract; samples are big-endian)
        out = out[0::2]
    elif depth < 8:
        # unpack MSB-first bit groups per SCANLINE (row padding bits are
        # discarded); gray scales by bit replication (1→×255, 2→×85,
        # 4→×17 — the spec's sample-depth scaling), palette keeps indices
        scale = 1 if ct == 3 else 255 // ((1 << depth) - 1)
        mask = (1 << depth) - 1
        per_byte = 8 // depth
        unpacked = bytearray(width * height)
        for y in range(height):
            base = y * stride
            for x in range(width):
                byte = out[base + x // per_byte]
                shift = 8 - depth * (x % per_byte + 1)
                unpacked[y * width + x] = ((byte >> shift) & mask) * scale
        out = unpacked
    if ct == 3:  # palette → RGB expansion
        rgb = bytearray()
        for idx in out:
            entry = plte[idx * 3 : idx * 3 + 3]
            if len(entry) < 3:
                raise ValueError(f"palette index {idx} beyond PLTE")
            rgb += entry
        return width, height, 3, bytes(rgb)
    return width, height, channels, bytes(out)
