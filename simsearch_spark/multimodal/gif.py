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
- Named NotImplementedError seams (never silent): animations (a second
  image descriptor).
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

__all__ = ["encode_gif", "decode_gif", "parse_gif_header"]

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
