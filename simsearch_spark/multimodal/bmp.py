"""BMP (Windows device-independent bitmap) codec — the simplest real-world
image container: a BITMAPFILEHEADER + the same BITMAPINFOHEADER/BI_RGB
pixel layout the AVI raw-video path already decodes (multimodal/avi.py
``decode_dib_frame``).  From scratch, dependency-free; public spec
(Windows BMP file format).  The reference engine has no media operators
(LLM-pipeline surface, SURVEY.md §6).

Scope: uncompressed (BI_RGB) 32/24/16-bit (implied 5-5-5 words expanded
by GDI's (c5<<3)|(c5>>2) bit replication) and 8/4/1-bit palette bitmaps
(sub-byte rows packed MSB-first into 4-byte-aligned strides), bottom-up
AND top-down (negative biHeight) row orders, BI_RLE8, and BI_RLE4 (r12 —
nibble-alternating encoded runs, word-padded absolute runs, EOL/EOB,
delta moves with the conventional zero fill; top-down RLE is illegal per
spec and rejected as malformed), and BI_BITFIELDS (compression 3, r12 —
explicit contiguous channel masks over 16/32-bit words, e.g. 5-6-5;
each channel expands by GDI's bit replication, exact on that level
set).  Named seams: embedded BI_JPEG/BI_PNG payloads and pre-BITMAPINFO
(OS/2 core) headers.  Everything here is lossless, so closed-form pixel
oracles are codec-invariant.
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
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    rle: bool = False,
    bits: int | None = None,
    top_down: bool = False,
    bitfields_565: bool = False,
) -> bytes:
    """Top-down row-major pixels → BMP bytes.  channels=3 writes BI_RGB
    24-bit (BGR, 4-byte stride); channels=1 writes a palette bitmap —
    ``bits`` picks 8 (default; 256-entry gray palette, BI_RLE8 when
    ``rle=True``) or 4/1 (r12: the palette holds the image's DISTINCT
    gray values — ≤16/≤2 required — so any two-tone image round-trips
    exactly; ``rle=True`` at 4 bits writes BI_RLE4).  ``top_down=True``
    writes negative biHeight with rows in natural order (BI_RGB only —
    top-down RLE is illegal per spec)."""
    if channels not in (1, 3):
        raise ValueError(f"BMP encode supports 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}x{channels}")
    if rle and channels != 1:
        raise ValueError("BI_RLE8/4 applies to palette bitmaps only")
    if rle and top_down:
        raise ValueError("top-down RLE BMP is illegal per spec")
    if bitfields_565 and (channels != 3 or bits != 16):
        raise ValueError("bitfields_565 applies to 16-bit RGB only")
    if channels == 3:
        if bits not in (None, 16, 24):
            raise ValueError("3-channel BMP encodes at 16 or 24 bits")
        n_colors = 0
        palette = b""
        rows = bytearray()
        ys = range(height) if top_down else range(height - 1, -1, -1)
        if bits == 16:
            # 5-5-5 (BI_RGB) or 5-6-5 (BI_BITFIELDS) words; each channel
            # value must sit on its bit-replication level set so the
            # round trip is exact
            widths = (5, 6, 5) if bitfields_565 else (5, 5, 5)
            shifts = (11, 5, 0) if bitfields_565 else (10, 5, 0)
            stride = (width * 2 + 3) & ~3
            for y in ys:
                row = bytearray(stride)
                for x in range(width):
                    rgb = pixels[3 * (y * width + x) : 3 * (y * width + x) + 3]
                    word = 0
                    for v, n, sh in zip(rgb, widths, shifts):
                        cn = v >> (8 - n)
                        if _replicate(cn, n) != v:
                            raise ValueError(
                                f"16-bit BMP requires {n}-bit-replicated "
                                f"values, got {v}"
                            )
                        word |= cn << sh
                    struct.pack_into("<H", row, 2 * x, word)
                rows += row
        else:
            bits = 24
            stride = (width * 3 + 3) & ~3
            for y in ys:
                row = bytearray()
                for x in range(width):
                    r, g, b = pixels[3 * (y * width + x) : 3 * (y * width + x) + 3]
                    row += bytes((b, g, r))
                row += b"\x00" * (stride - len(row))
                rows += row
    else:
        bits = 8 if bits is None else bits
        if bits not in (1, 4, 8):
            raise ValueError(f"palette BMP encodes at 1/4/8 bits, got {bits}")
        if rle and bits == 1:
            raise ValueError("RLE applies to 4- or 8-bit bitmaps only")
        if bits == 8:
            palette = b"".join(bytes((v, v, v, 0)) for v in range(256))
            n_colors = 256
            idx = pixels
        else:
            values = sorted(set(pixels))
            n_colors = 1 << bits
            if len(values) > n_colors:
                raise ValueError(
                    f"{bits}-bit BMP holds {n_colors} palette entries, "
                    f"image has {len(values)} distinct values"
                )
            lut = {v: i for i, v in enumerate(values)}
            palette = b"".join(bytes((v, v, v, 0)) for v in values)
            palette += b"\x00" * (4 * n_colors - len(palette))
            idx = bytes(lut[v] for v in pixels)
        if rle:
            rows = bytearray(
                _rle8_encode(idx, width, height)
                if bits == 8
                else _rle4_encode(idx, width, height)
            )
        else:
            stride = ((width * bits + 31) // 32) * 4
            rows = bytearray()
            ys = range(height) if top_down else range(height - 1, -1, -1)
            for y in ys:
                row = bytearray(stride)
                for x in range(width):
                    v = idx[y * width + x]
                    if bits == 8:
                        row[x] = v
                    elif bits == 4:
                        row[x >> 1] |= v << (0 if x & 1 else 4)
                    else:
                        row[x >> 3] |= v << (7 - (x & 7))
                rows += row
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F) if bitfields_565 else b""
    comp = 3 if bitfields_565 else (0 if not rle else (1 if bits == 8 else 2))
    off = 14 + 40 + len(masks) + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, -height if top_down else height, 1, bits,
        comp, len(rows), 2835, 2835, n_colors, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    return file_hdr + info + masks + palette + bytes(rows)


def _replicate(v: int, n: int) -> int:
    """Expand an n-bit channel value to 8 bits by bit replication —
    GDI's convention (the 5-5-5 path's (c5<<3)|(c5>>2) generalized)."""
    out, sh = 0, 8
    while sh > 0:
        sh -= n
        out |= (v << sh) if sh >= 0 else (v >> -sh)
    return out & 0xFF


def _mask_layout(mask: int, word_bits: int) -> tuple[int, int]:
    """(shift, width) of a contiguous BI_BITFIELDS channel mask."""
    if mask == 0 or mask >> word_bits:
        raise ValueError(f"BI_BITFIELDS mask {mask:#x} outside {word_bits}-bit word")
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    if (mask >> shift) != (1 << width) - 1:
        raise ValueError(f"BI_BITFIELDS mask {mask:#x} is not contiguous")
    if width > 8:
        # legal in real files (A2R10G10B10 etc.) but unsupported here —
        # a named seam, not a malformed-input error
        raise NotImplementedError(f"BI_BITFIELDS channel width {width} > 8")
    return shift, width


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


def _rle4_decode(body: bytes, w: int, h: int) -> bytes:
    """BI_RLE4 stream → top-down w×h palette indices (one nibble each,
    UNPACKED to a byte here).  Same grammar as RLE8 except values are
    nibbles: an encoded run ``n, v`` alternates v's high and low nibbles
    n times; an absolute run of n stores ceil(n/2) packed bytes, padded
    to a word boundary."""
    idx = bytearray(w * h)
    x = y = 0  # y counts from the BOTTOM row
    i = 0
    while i + 1 < len(body):
        n, v = body[i], body[i + 1]
        i += 2
        if n > 0:
            if x + n > w or y >= h:
                raise ValueError("RLE4 run outside the bitmap")
            row = h - 1 - y
            hi, lo = v >> 4, v & 15
            for k in range(n):
                idx[row * w + x + k] = hi if k % 2 == 0 else lo
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return bytes(idx)
        elif v == 2:  # delta
            if i + 2 > len(body):
                raise ValueError("truncated RLE4 delta")
            x, y = x + body[i], y + body[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("RLE4 delta outside the bitmap")
        else:  # absolute run of v nibbles, packed, word-aligned
            nb = (v + 1) // 2
            if i + nb > len(body):
                raise ValueError("truncated RLE4 literal run")
            if x + v > w or y >= h:
                raise ValueError("RLE4 literal run outside the bitmap")
            row = h - 1 - y
            for k in range(v):
                b = body[i + (k >> 1)]
                idx[row * w + x + k] = (b >> 4) if k % 2 == 0 else (b & 15)
            x += v
            i += nb + (nb & 1)
    raise ValueError("RLE4 stream without an end-of-bitmap marker")


def _rle4_encode(idx: bytes, w: int, h: int) -> bytes:
    """Top-down nibble indices (one per byte, < 16) → BI_RLE4 (maximal
    equal-value encoded runs — ``(v<<4)|v`` repeats one nibble — EOL per
    row, EOB at the end)."""
    out = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = idx[y * w : (y + 1) * w]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            out += bytes((run, (row[x] << 4) | row[x]))
            x += run
        out += b"\x00\x00"
    out += b"\x00\x01"
    return bytes(out)


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) — 32/24-bit BI_RGB directly
    (both row orders), 8/4/1-bit through the palette (gray palettes
    collapse to 1 channel, like GIF), BI_RLE8/BI_RLE4 through the
    run-length decoders."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    core = hdr_size == 12
    os2v2 = False
    if core:
        # OS/2 BITMAPCOREHEADER (r13): 16-bit unsigned geometry, no
        # compression field (always BI_RGB), RGB-TRIPLE palette
        w, h, _planes, bits = struct.unpack("<HHHH", data[18:26])
        comp = 0
        if bits not in (1, 4, 8, 24):
            raise ValueError(
                f"OS/2 core BMP with bit depth {bits} (1/4/8/24 only per spec)"
            )
    elif hdr_size >= 40:
        w, h, _planes, bits = struct.unpack("<iiHH", data[18:30])
        (comp,) = struct.unpack("<I", data[30:34])
        # OS/2 BITMAPINFOHEADER2 shares the Windows layout for its first
        # 40 bytes — only the compression ENUM differs.  Windows header
        # sizes are exactly 40/52/56/108/124; every OTHER length in
        # 41..64 is an OS/2 2.x truncation (review r14 — classifying
        # them as Windows would misread OS/2 enum 3/4 as
        # BI_BITFIELDS/BI_JPEG, a silent misdecode)
        os2v2 = hdr_size == 64 or (
            40 < hdr_size < 64 and hdr_size not in (52, 56)
        )
    elif hdr_size >= 16:
        # OS/2 2.x TRUNCATED header (r14): the 2.x spec allows ANY header
        # length 16..64; present fields share the Windows field layout,
        # absent fields read as zero.  16 bytes carries exactly
        # (size, w, h, planes, bits); compression needs ≥ 20.
        w, h, _planes, bits = struct.unpack("<iiHH", data[18:30])
        comp = struct.unpack("<I", data[30:34])[0] if hdr_size >= 20 else 0
        os2v2 = True
    else:
        raise NotImplementedError(
            f"BMP header size {hdr_size} (BITMAPCOREHEADER, OS/2 2.x "
            "16..64, or BITMAPINFOHEADER+ only)"
        )
    if not core and os2v2 and comp in (3, 4):
        # PERMANENT pin: under an OS/2 2.x header the enum values 3/4
        # mean Huffman-1D / RLE24 (not BI_BITFIELDS / BI_JPEG); both are
        # OS/2-era curiosities with under-specified bit packing that no
        # mainstream writer ever emitted — loud seam, not a decode
        raise NotImplementedError(
            f"OS/2 2.x BMP compression {comp} "
            f"({'Huffman 1D' if comp == 3 else 'RLE24'})"
        )
    if comp in (11, 12, 13):
        # PERMANENT pin (r14): BI_CMYK / BI_CMYKRLE8 / BI_CMYKRLE4 are
        # defined ONLY for bitmaps inside Windows metafiles (the
        # BITMAPINFOHEADER documentation scopes them to metafile use); a
        # standalone BMP carrying them has no display semantics (no ink
        # model, no profile) — malformed input, not a decodable seam
        raise ValueError(
            f"BI_CMYK-family compression {comp} is metafile-only — "
            "not valid in a standalone BMP"
        )
    if comp not in (0, 1, 2, 3, 4, 5, 6):
        raise NotImplementedError(
            f"BMP compression {comp} (BI_RGB / BI_RLE8 / BI_RLE4 / "
            "BI_BITFIELDS / BI_JPEG / BI_PNG / BI_ALPHABITFIELDS only)"
        )
    masks = None
    alpha_mask = None
    if comp in (3, 6):
        # BI_BITFIELDS (r12): three contiguous channel masks follow the
        # 40-byte header (V4/V5 headers store them at the same offset);
        # BI_ALPHABITFIELDS (r13) appends a fourth ALPHA mask DWORD —
        # zero means "no alpha stored" and decodes like BI_BITFIELDS
        n_masks = 3 if comp == 3 else 4
        if bits not in (16, 32):
            raise ValueError(f"BI_BITFIELDS with bit depth {bits} (16/32 only)")
        if len(data) < 54 + 4 * n_masks:
            raise ValueError("BI_BITFIELDS without mask DWORDs")
        raw_masks = list(struct.unpack(f"<{n_masks}I", data[54 : 54 + 4 * n_masks]))
        if comp == 6:
            alpha_mask = raw_masks.pop()
        for i, a in enumerate(raw_masks):
            for b in raw_masks[i + 1 :]:
                if a & b:
                    raise ValueError(
                        f"BI_BITFIELDS masks overlap: "
                        f"{[hex(m) for m in raw_masks]}"
                    )
        if alpha_mask and any(alpha_mask & m for m in raw_masks):
            raise ValueError(
                f"BI_ALPHABITFIELDS alpha mask {alpha_mask:#x} overlaps a "
                "color mask"
            )
        masks = [_mask_layout(m, bits) for m in raw_masks]
        if alpha_mask:
            alpha_mask = _mask_layout(alpha_mask, bits)
    if comp == 1 and bits != 8:
        raise ValueError(f"BI_RLE8 with bit depth {bits} (must be 8)")
    if comp == 2 and bits != 4:
        raise ValueError(f"BI_RLE4 with bit depth {bits} (must be 4)")
    top_down = h < 0
    if top_down and comp in (1, 2):
        raise ValueError("top-down RLE BMP is illegal per spec")
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP geometry {w}x{h}")
    body = data[off:]
    if comp in (4, 5):
        # BI_JPEG / BI_PNG (r13): the "pixel data" is a complete
        # JPEG/PNG stream (GDI passthrough form) — route it to the
        # in-repo codecs; the header geometry must agree with the
        # embedded image (the stream is natively top-down)
        if comp == 4:
            from simsearch_spark.multimodal.jpeg import decode_jpeg as _dec
        else:
            from simsearch_spark.multimodal.png import decode_png as _dec
        ew, eh, ech, epx = _dec(bytes(body))
        if (ew, eh) != (w, h):
            raise ValueError(
                f"BI_{'JPEG' if comp == 4 else 'PNG'} stream geometry "
                f"{ew}x{eh} != BMP header {w}x{h}"
            )
        return ew, eh, ech, epx
    if bits == 24:
        if not top_down:
            return w, h, 3, decode_dib_frame(body, w, h)
        # top-down: decode_dib_frame's layout with rows in natural order
        stride = (w * 3 + 3) & ~3
        if len(body) < stride * h:
            raise ValueError(f"BMP pixel data {len(body)} B < {stride}x{h} layout")
        flipped = b"".join(
            body[y * stride : (y + 1) * stride] for y in range(h - 1, -1, -1)
        )
        return w, h, 3, decode_dib_frame(flipped, w, h)
    if bits == 16:
        # BI_RGB 16-bit is implied X1-R5-G5-B5 little-endian words;
        # BI_BITFIELDS supplies explicit masks (5-6-5 the common case);
        # a BI_ALPHABITFIELDS alpha mask appends a 4th channel (r13).
        # Each channel expands by GDI's bit replication.
        layout = masks or [(10, 5), (5, 5), (0, 5)]
        if alpha_mask:
            layout = layout + [alpha_mask]
        nch = len(layout)
        stride = (w * 2 + 3) & ~3
        if len(body) < stride * h:
            raise ValueError(f"BMP pixel data {len(body)} B < {stride}x{h} layout")
        # per-channel expansion LUTs: 32-256 entries once, instead of a
        # Python _replicate call per pixel per channel (hot path —
        # resize_images feeds full images through here)
        luts = [
            (sh, (1 << n) - 1, bytes(_replicate(v, n) for v in range(1 << n)))
            for sh, n in layout
        ]
        out = bytearray(nch * w * h)
        for y in range(h):
            src = (y if top_down else h - 1 - y) * stride
            for x in range(w):
                (word,) = struct.unpack_from("<H", body, src + 2 * x)
                for c, (sh, m, lut) in enumerate(luts):
                    out[nch * (y * w + x) + c] = lut[(word >> sh) & m]
        return w, h, nch, bytes(out)
    if bits == 32:
        # BGRX quads (BI_RGB) or masked DWORDs (BI_BITFIELDS, plus the
        # alpha channel under BI_ALPHABITFIELDS); rows are naturally
        # 4-byte aligned
        if len(body) < 4 * w * h:
            raise ValueError(f"BMP pixel data {len(body)} B < {4 * w * h} B layout")
        layout32 = list(masks or [])
        if alpha_mask:
            layout32.append(alpha_mask)
        nch = len(layout32) if layout32 else 3
        luts32 = [
            (sh, (1 << n) - 1, bytes(_replicate(v, n) for v in range(1 << n)))
            for sh, n in layout32
        ]
        out = bytearray(nch * w * h)
        for y in range(h):
            src = (y if top_down else h - 1 - y) * 4 * w
            for x in range(w):
                if masks is None:
                    b, g, r = body[src + 4 * x : src + 4 * x + 3]
                    px = (r, g, b)
                else:
                    (word,) = struct.unpack_from("<I", body, src + 4 * x)
                    px = tuple(
                        lut[(word >> sh) & m] for sh, m, lut in luts32
                    )
                out[nch * (y * w + x) : nch * (y * w + x) + nch] = bytes(px)
        return w, h, nch, bytes(out)
    if bits in (1, 4, 8):
        if core:
            # OS/2 palette: RGBTRIPLE entries, count fixed at 2^bits —
            # widen to the BGRX layout the expansion below reads
            n_colors = 1 << bits
            raw = data[26 : 26 + 3 * n_colors]
            if len(raw) < 3 * n_colors:
                raise ValueError("truncated BMP palette")
            pal = b"".join(
                raw[3 * i : 3 * i + 3] + b"\x00" for i in range(n_colors)
            )
        else:
            # biClrUsed lives at header offset 32 (file 46) — present only
            # when the (possibly truncated OS/2 2.x) header reaches it
            n_colors = (
                struct.unpack("<I", data[46:50])[0] if hdr_size >= 36 else 0
            ) or (1 << bits)
            pal = data[14 + hdr_size : 14 + hdr_size + 4 * n_colors]
            if len(pal) < 4 * n_colors:
                raise ValueError("truncated BMP palette")
        if comp == 1:
            idx = bytearray(_rle8_decode(body, w, h))
        elif comp == 2:
            idx = bytearray(_rle4_decode(body, w, h))
        else:
            stride = ((w * bits + 31) // 32) * 4
            if len(body) < stride * h:
                raise ValueError(f"BMP pixel data {len(body)} B < {stride}x{h} layout")
            idx = bytearray(w * h)
            for y in range(h):
                src = (y if top_down else h - 1 - y) * stride
                if bits == 8:
                    idx[y * w : (y + 1) * w] = body[src : src + w]
                elif bits == 4:
                    for x in range(w):
                        b = body[src + (x >> 1)]
                        idx[y * w + x] = (b >> 4) if x % 2 == 0 else (b & 15)
                else:
                    for x in range(w):
                        idx[y * w + x] = (body[src + (x >> 3)] >> (7 - (x & 7))) & 1
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
    raise NotImplementedError(f"BMP bit depth {bits} (1/4/8/16/24/32 only)")
