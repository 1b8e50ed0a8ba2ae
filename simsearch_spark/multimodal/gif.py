"""GIF (GIF87a/GIF89a) codec — from scratch, dependency-free, like the
sibling PNG/JPEG/WAV/FLAC/AVI codecs (no reference-engine counterpart; the
reference has no media operators at all — this is LLM-pipeline surface,
SURVEY.md §6).  Public spec: CompuServe GIF89a specification (1990) and
the Welch LZW construction it mandates.

Scope (the bounded-failure contract of multimodal/binary.py):

- DECODE: logical screen descriptor, global AND local color tables, all
  extension blocks skipped structurally (GCE/comment/application/plain
  text), one image — interlaced (GIF89a appendix E four-pass row order,
  r11) or not — full variable-width LZW with CLEAR / EOI handling and
  12-bit dictionary growth.  Palette-indexed pixels expand through the
  active color table; when every REFERENCED palette entry is gray
  (r==g==b) the image decodes to 1 channel (the synthesized grayscale
  round-trip shape), otherwise to 3-channel RGB.
- ANIMATION (r11): ``decode_gif_frames`` composites multi-image GIFs
  with full GCE semantics — per-frame sub-rects at their offsets,
  transparency-index skip, disposal 0/1 (keep) / 2 (restore rect to
  background) / 3 (restore previous canvas) — and
  ``encode_gif_animation`` writes the NETSCAPE2.0-looped dual.  The
  single-image ``decode_gif`` keeps its strict contract (a second image
  descriptor raises — callers wanting frames use the frames API).
- ENCODE: GIF89a with a global color table built from the image's
  distinct colors (> 256 distinct raises ValueError — that image needs a
  quantizer, which is out of scope), LZW-compressed index stream with
  dictionary resets at the 4096-code ceiling, optional interlaced row
  order.  Lossless for any image that fits a palette, so closed-form
  pixel oracles are codec-invariant (the same property FLAC gives the
  audio queries).

Pipeline shape: both directions are row-local byte work inside Arrow
batches (multimodal/binary.py) — no shuffle, no UDF-per-row.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_gif",
    "decode_gif",
    "parse_gif_header",
    "decode_gif_frames",
    "encode_gif_animation",
]

_TRAILER = 0x3B
_EXTENSION = 0x21
_IMAGE = 0x2C
_MAX_CODE_SIZE = 12


# -----------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable code width, CLEAR/EOI)
# -----------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Decode a GIF LZW stream into palette indexes.  Stops after
    ``n_pixels`` outputs or EOI, whichever comes first; raises on corrupt
    code references."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # bit reader state (LSB-first across the whole concatenated stream)
    acc = 0
    nbits = 0
    pos = 0

    def read(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return -1  # truncated stream: treat as end
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    def reset() -> tuple[list[bytes | None], int, int]:
        table: list[bytes | None] = [bytes([i]) for i in range(clear)]
        table += [None, None]  # CLEAR, EOI placeholders
        return table, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read(width)
        if code == -1 or code == eoi:
            break
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} before definition")
        out.extend(entry)
        if prev is not None:
            if next_code < (1 << _MAX_CODE_SIZE):
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < _MAX_CODE_SIZE:
                    width += 1
        prev = entry
    return out


def _lzw_encode(indexes: bytes, min_code_size: int) -> bytes:
    """Encode palette indexes as a GIF LZW stream (CLEAR first, dictionary
    reset at the 4096-code ceiling, EOI last)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    emit(clear, width)
    prev = b""
    for b in indexes:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < (1 << _MAX_CODE_SIZE):
            table[cur] = next_code
            # GIF writers grow the width when the NEXT code to assign no
            # longer fits — decoder growth mirrors this exactly
            if next_code == (1 << width) and width < _MAX_CODE_SIZE:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table, next_code, width = reset()
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# -----------------------------------------------------------------------------
# container
# -----------------------------------------------------------------------------


def parse_gif_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor — the metadata
    sniff (multimodal/binary.py ``_sniff_header``)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack("<HH", data[6:10])
    return int(w), int(h)


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks starting at ``pos``; returns
    (bytes, position after the 0 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-block stream")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + ln])
        if len(data[pos : pos + ln]) != ln:
            raise ValueError("truncated GIF sub-block")
        pos += ln


#: GIF89a appendix E interlace passes: (first row, row step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: bytes, w: int, h: int) -> bytes:
    """Reorder LZW-output rows from interlace pass order (rows 0,8,16…,
    then 4,12…, then 2,6…, then odd rows) to top-down raster order."""
    out = bytearray(w * h)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y * w : (y + 1) * w] = idx[src * w : (src + 1) * w]
            src += 1
    return bytes(out)


def _interlace(idx: bytes, w: int, h: int) -> bytes:
    """Raster order → interlace pass order (the encoder dual)."""
    out = bytearray()
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out += idx[y * w : (y + 1) * w]
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) of the first (only) image,
    interlaced or not (GIF89a appendix E four-pass row order).
    Channels is 1 when every referenced palette entry is gray, else 3."""
    sw, sh = parse_gif_header(data)
    packed = data[10]
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = data[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n

    image = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            pos += 1  # label — all extension types are structurally alike
            _body, pos = _sub_blocks(data, pos)
            continue
        if block != _IMAGE:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if image is not None:
            raise NotImplementedError("animated GIF (multiple images) not supported")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        interlaced = bool(ipacked & 0x40)
        table = gct
        if ipacked & 0x80:
            n = 2 ** ((ipacked & 0x07) + 1)
            table = data[pos : pos + 3 * n]
            if len(table) != 3 * n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image with no color table")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise ValueError(f"invalid LZW min code size {mcs}")
        stream, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(stream, mcs, w * h)
        if len(idx) < w * h:
            raise ValueError(
                f"LZW stream ended after {len(idx)} of {w * h} pixels"
            )
        idx = bytes(idx[: w * h])
        if interlaced:
            idx = _deinterlace(idx, int(w), int(h))
        image = (int(w), int(h), idx, table)

    if image is None:
        raise ValueError("GIF with no image descriptor")
    w, h, idx, table = image
    n_entries = len(table) // 3
    used = set(idx)
    bad = [i for i in used if i >= n_entries]
    if bad:
        raise ValueError(f"palette index {max(bad)} outside {n_entries}-entry table")
    gray = all(
        table[3 * i] == table[3 * i + 1] == table[3 * i + 2] for i in used
    )
    if gray:
        lut = bytes(table[3 * i] for i in range(n_entries))
        return w, h, 1, bytes(lut[i] for i in idx)
    out = bytearray(3 * len(idx))
    for p, i in enumerate(idx):
        out[3 * p : 3 * p + 3] = table[3 * i : 3 * i + 3]
    return w, h, 3, bytes(out)


def encode_gif(
    width: int, height: int, channels: int, pixels: bytes, interlace: bool = False
) -> bytes:
    """GIF89a bytes for a 1- (grayscale) or 3-channel (RGB) image.  The
    global color table is the image's distinct colors in first-seen order;
    more than 256 distinct colors raises ValueError (palette images only —
    quantization is a separate concern).  ``interlace=True`` writes the
    four-pass row order with the descriptor flag set (lossless either
    way)."""
    if channels not in (1, 3):
        raise ValueError(f"GIF encode supports 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    colors: dict[bytes, int] = {}
    idx = bytearray(width * height)
    for p in range(width * height):
        c = (
            bytes([pixels[p]] * 3)
            if channels == 1
            else bytes(pixels[3 * p : 3 * p + 3])
        )
        code = colors.get(c)
        if code is None:
            if len(colors) == 256:
                raise ValueError("more than 256 distinct colors: GIF needs a quantizer")
            code = len(colors)
            colors[c] = code
        idx[p] = code
    # table size: power of two >= max(2, n_colors); packed field stores log2-1
    n = max(2, len(colors))
    bits = max(1, (n - 1).bit_length())
    table = bytearray()
    for c in colors:
        table += c
    table += b"\x00" * (3 * (2**bits) - len(table))

    mcs = max(2, bits)  # LZW min code size (spec floor: 2)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += table
    out += struct.pack(
        "<BHHHHB", _IMAGE, 0, 0, width, height, 0x40 if interlace else 0
    )
    out.append(mcs)
    if interlace:
        idx = bytearray(_interlace(bytes(idx), width, height))
    stream = _lzw_encode(bytes(idx), mcs)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(_TRAILER)
    return bytes(out)


# -----------------------------------------------------------------------------
# animation (r11): multi-image GIFs with GCE compositing
# -----------------------------------------------------------------------------


def decode_gif_frames(data: bytes) -> tuple[int, int, int, list[tuple[int, bytes]]]:
    """(screen_w, screen_h, channels, [(delay_cs, pixels), …]) — ANIMATED
    GIF decode with full Graphic-Control-Extension compositing: each
    returned frame is the logical screen AFTER drawing image n (sub-rects
    composited at their left/top offsets, transparent-index pixels leave
    the canvas untouched), and disposal methods 0/1 (keep), 2 (restore
    the rect to the background color) and 3 (restore the pre-draw canvas)
    apply between frames.  ``channels`` follows the module's gray-collapse
    convention over the WHOLE animation (1 when every drawn palette entry
    and the background are gray, else 3); delays are in centiseconds.
    Works on single-image GIFs too (one frame, delay 0)."""
    sw, sh = parse_gif_header(data)
    packed = data[10]
    bg_idx = data[11]
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = data[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    if gct is not None and bg_idx < len(gct) // 3:
        bg = gct[3 * bg_idx : 3 * bg_idx + 3]
    else:
        bg = b"\x00\x00\x00"
    canvas = bytearray(bg * (sw * sh))
    frames: list[tuple[int, bytes]] = []
    used_rgb: set[bytes] = {bytes(bg)}

    disposal, transparent, delay = 0, None, 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # Graphic Control Extension
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                delay = body[1] | (body[2] << 8)
                transparent = body[3] if flags & 0x01 else None
            continue
        if block != _IMAGE:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 ** ((ipacked & 0x07) + 1)
            table = data[pos : pos + 3 * n]
            if len(table) != 3 * n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image with no color table")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise ValueError(f"invalid LZW min code size {mcs}")
        stream, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(stream, mcs, w * h)
        if len(idx) < w * h:
            raise ValueError(f"LZW stream ended after {len(idx)} of {w * h} pixels")
        idx = bytes(idx[: w * h])
        if ipacked & 0x40:
            idx = _deinterlace(idx, int(w), int(h))
        if left + w > sw or top + h > sh:
            raise ValueError("GIF frame rect outside the logical screen")
        n_entries = len(table) // 3
        before = bytes(canvas) if disposal == 3 else None
        for y in range(h):
            crow = 3 * ((top + y) * sw + left)
            srow = y * w
            for x in range(w):
                i = idx[srow + x]
                if i == transparent:
                    continue
                if i >= n_entries:
                    raise ValueError(
                        f"palette index {i} outside {n_entries}-entry table"
                    )
                rgb = table[3 * i : 3 * i + 3]
                canvas[crow + 3 * x : crow + 3 * x + 3] = rgb
                used_rgb.add(bytes(rgb))
        frames.append((delay, bytes(canvas)))
        if disposal == 2:
            for y in range(h):
                crow = 3 * ((top + y) * sw + left)
                canvas[crow : crow + 3 * w] = bg * w
        elif disposal == 3 and before is not None:
            canvas = bytearray(before)
        disposal, transparent, delay = 0, None, 0

    if not frames:
        raise ValueError("GIF with no image descriptor")
    gray = all(c[0] == c[1] == c[2] for c in used_rgb)
    if gray:
        return sw, sh, 1, [(d, f[0::3]) for d, f in frames]
    return sw, sh, 3, frames


def encode_gif_animation(
    width: int,
    height: int,
    channels: int,
    frames: list[bytes],
    delay_cs: int = 4,
) -> bytes:
    """GIF89a animation: full-screen frames sharing one global color
    table built from the union of all frames' distinct colors (> 256
    raises — quantization is out of scope), a NETSCAPE2.0 loop block, and
    one GCE (disposal 1 = keep, no transparency) per frame."""
    if channels not in (1, 3):
        raise ValueError(f"GIF encode supports 1 or 3 channels, got {channels}")
    if not frames:
        raise ValueError("animation needs at least one frame")
    colors: dict[bytes, int] = {}
    idx_frames: list[bytes] = []
    for pixels in frames:
        if len(pixels) != width * height * channels:
            raise ValueError(
                f"frame buffer {len(pixels)} != {width}x{height}x{channels}"
            )
        idx = bytearray(width * height)
        for p in range(width * height):
            c = (
                bytes([pixels[p]] * 3)
                if channels == 1
                else bytes(pixels[3 * p : 3 * p + 3])
            )
            code = colors.get(c)
            if code is None:
                if len(colors) == 256:
                    raise ValueError(
                        "more than 256 distinct colors: GIF needs a quantizer"
                    )
                code = len(colors)
                colors[c] = code
            idx[p] = code
        idx_frames.append(bytes(idx))
    n = max(2, len(colors))
    bits = max(1, (n - 1).bit_length())
    table = bytearray()
    for c in colors:
        table += c
    table += b"\x00" * (3 * (2**bits) - len(table))
    mcs = max(2, bits)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += table
    # NETSCAPE2.0 application extension: loop forever (the conventional
    # marker every animated-GIF writer emits)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx in idx_frames:
        out += struct.pack("<BBBBHB", 0x21, 0xF9, 4, 0x04, delay_cs, 0) + b"\x00"
        out += struct.pack("<BHHHHB", _IMAGE, 0, 0, width, height, 0)
        out.append(mcs)
        stream = _lzw_encode(idx, mcs)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(_TRAILER)
    return bytes(out)
