"""TIFF 6.0 codec — grayscale/RGB strips, both byte orders, uncompressed /
PackBits / LZW (with the horizontal-differencing predictor).  From
scratch, dependency-free, like the sibling codecs (no reference-engine
counterpart — LLM-pipeline surface, SURVEY.md §6).  Public specs: Adobe
TIFF 6.0 (1992) Part 1 (Baseline) + §9 (PackBits) + §13 (LZW); the
PackBits byte semantics are Apple's TN1023 scheme the TIFF spec adopts.

Scope:
- DECODE: II (little-endian) and MM (big-endian) headers, one IFD,
  SHORT/LONG tag values (inline or offset), multi-strip assembly (each
  strip decompresses independently, per spec), Compression 1
  (uncompressed), 5 (LZW — MSB-first bit packing, EARLY code-width
  change, 12-bit ceiling, per TIFF 6.0 §13) and 32773 (PackBits),
  Predictor 2 (horizontal differencing) for LZW strips,
  PhotometricInterpretation 0 (WhiteIsZero — inverted to gray), 1
  (BlackIsZero, 8-bit gray), 2 (RGB, 8-bit/sample) and 3 (palette via the
  16-bit ColorMap, gray-collapse convention shared with GIF/BMP),
  PlanarConfiguration 1 (chunky).  TIFF rows are top-down — no flip,
  unlike BMP/DIB.
- TILED images (TIFF 6.0 §15, r11): full tw×tl blocks in row-major tile
  order, any supported compression per tile (incl. JPEG tiles, r12),
  predictor per tile row, edge padding clipped at the blit.
- MULTI-PAGE (r12): the IFD chain walks via next-IFD offsets —
  ``decode_tiff(data, page=N)``, ``tiff_page_count``, and a relocating
  multi-page encoder (``encode_tiff_multipage``).
- PLANAR separation (PlanarConfiguration 2, r11): per-plane strip runs
  (all plane-0 strips, then plane 1, …), each plane decoding like an
  independent grayscale image, interleaved to chunky RGB.
- JPEG-in-TIFF (compression 7): self-contained per-strip/per-tile
  streams AND the JPEGTables form (TIFF/EP tag 347 — shared abbreviated
  tables spliced after each stream's SOI, r12), via the in-repo
  baseline/progressive JPEG decoder.
- PLANAR TILED (r12): per-plane tile runs (all plane-0 tiles row-major,
  then plane 1, …), each plane assembling like a 1-sample tiled image.
- BIT DEPTHS beyond 8 (r12, single-plane strip path): 1-bit bilevel and
  4-bit gray/palette (MSB-first packed, byte-aligned rows, bit
  replication ×255/×17 to 8-bit — exact), 16-bit gray (high-byte
  reduction in the file's byte order, the PNG-16/ColorMap convention;
  predictor 2 differences in SAMPLE space mod 65536 under LZW);
  palette ColorMaps size 3×2^bps.
- Named NotImplementedError seams: CCITT compression, planar
  JPEG-in-TIFF strips, mask/CMYK/YCbCr photometrics, non-8-bit depths
  on the tiled/planar/predictor-2/JPEG paths, mixed bits-per-sample.
- ENCODE: little-endian, single strip, BlackIsZero gray or chunky RGB,
  compression None/"packbits"/"lzw" (+ predictor 2 for LZW),
  bits_per_sample 16/4/1 for gray (exact v*257 widening / packed
  bit-replication-representable values).  All lossless, so closed-form
  pixel oracles stay codec-invariant.

The TIFF LZW variant vs the GIF one (multimodal/gif.py): bits pack
MSB-FIRST (GIF: LSB-first), code width starts at 9 with an 8-bit symbol
alphabet fixed by the spec (GIF: palette-sized), and the width grows one
code EARLY — when the next code to assign reaches 2^width − 1, not
2^width — because the spec reserves the all-ones code boundary.  Distinct
enough that sharing the GIF core would need flags on every line; each
codec keeps its own ~50-line loop, pinned by a hand-derived bit-exact
vector in tests/test_tiff.py.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "encode_tiff",
    "encode_tiff_jpeg",
    "encode_tiff_multipage",
    "decode_tiff",
    "parse_tiff_header",
    "tiff_page_count",
]


# -----------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9 / Apple TN1023)
# -----------------------------------------------------------------------------


def unpackbits(data: bytes, expected: int) -> bytes:
    """Decode one PackBits-compressed strip to exactly ``expected`` bytes."""
    out = bytearray()
    pos = 0
    while len(out) < expected and pos < len(data):
        n = data[pos]
        pos += 1
        if n < 128:  # 0..127: copy n+1 literal bytes
            if pos + n + 1 > len(data):
                raise ValueError("truncated PackBits literal run")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # 129..255 = -127..-1: repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op, per spec
    if len(out) < expected:
        raise ValueError(f"PackBits strip yields {len(out)} B < {expected} B")
    return bytes(out[:expected])


def packbits(data: bytes) -> bytes:
    """Encode one strip: maximal repeat runs (≥3), literals otherwise."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


# -----------------------------------------------------------------------------
# LZW (TIFF 6.0 §13: MSB-first, 9→12-bit codes, EARLY change)
# -----------------------------------------------------------------------------

_LZW_CLEAR = 256
_LZW_EOI = 257
_LZW_MAX_WIDTH = 12
#: encoders must emit a Clear before the table would outgrow 12 bits; the
#: spec's own pseudo-code resets at 4094 (one short of the early-change
#: all-ones boundary at width 12)
_LZW_RESET_AT = 4094


def lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """Decode one TIFF-LZW strip to exactly ``expected`` bytes."""
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0

    def read(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return -1
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        v = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        return v

    def reset():
        table: list[bytes | None] = [bytes([i]) for i in range(256)]
        table += [None, None]  # CLEAR, EOI
        return table, _LZW_EOI + 1, 9

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == -1 or code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table, next_code, width = reset()
            prev = None
            continue
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt TIFF-LZW stream: code {code} before definition")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            next_code += 1
            # EARLY change: the width grows when the next code to assign
            # reaches 2^width − 1 (GIF waits for 2^width)
            if next_code == (1 << width) - 1 and width < _LZW_MAX_WIDTH:
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError(f"TIFF-LZW strip yields {len(out)} B < {expected} B")
    return bytes(out[:expected])


def lzw_encode_tiff(data: bytes) -> bytes:
    """Encode one strip as a TIFF-LZW stream (Clear first, reset at 4094,
    EOI last) — the exact dual of ``lzw_decode_tiff``."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    def reset():
        return {bytes([i]): i for i in range(256)}, _LZW_EOI + 1, 9

    table, next_code, width = reset()
    emit(_LZW_CLEAR, width)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        # EARLY change, encoder side: widen when the JUST-ASSIGNED code is
        # 2^width − 1 — the decoder (which lags the table by one entry)
        # then switches exactly one read earlier, before the first code
        # that needs the wider field
        if next_code == (1 << width) - 1 and width < _LZW_MAX_WIDTH:
            width += 1
        next_code += 1
        prev = bytes([b])
        if next_code == _LZW_RESET_AT:
            emit(table[prev], width)
            emit(_LZW_CLEAR, width)
            table, next_code, width = reset()
            prev = b""
    if prev:
        emit(table[prev], width)
    emit(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _undiff_rows(body: bytearray, w: int, rows: int, spp: int) -> None:
    """Predictor 2 decode in place: each sample adds its left neighbor of
    the same channel (per row), mod 256."""
    stride = w * spp
    for r in range(rows):
        base = r * stride
        for i in range(spp, stride):
            body[base + i] = (body[base + i] + body[base + i - spp]) & 0xFF


def _diff_rows(pixels: bytes, w: int, rows: int, spp: int) -> bytes:
    """Predictor 2 encode: each sample minus its left same-channel
    neighbor (per row), mod 256."""
    out = bytearray(pixels)
    stride = w * spp
    for r in range(rows):
        base = r * stride
        for i in range(stride - 1, spp - 1, -1):
            out[base + i] = (out[base + i] - out[base + i - spp]) & 0xFF
    return bytes(out)


def _undiff_rows16(body: bytearray, w: int, rows: int, bo: str) -> None:
    """Predictor 2 decode for 16-BIT samples (r12): differencing happens
    in SAMPLE space (mod 65536, TIFF 6.0 §14), words in file byte order."""
    for r in range(rows):
        base = r * w * 2
        prev = struct.unpack_from(bo + "H", body, base)[0]
        for x in range(1, w):
            off = base + 2 * x
            prev = (struct.unpack_from(bo + "H", body, off)[0] + prev) & 0xFFFF
            struct.pack_into(bo + "H", body, off, prev)


def _diff_rows16(pixels: bytes, w: int, rows: int, bo: str) -> bytes:
    """Predictor 2 encode for 16-bit samples — the exact dual."""
    out = bytearray(pixels)
    for r in range(rows):
        base = r * w * 2
        for x in range(w - 1, 0, -1):
            off = base + 2 * x
            cur = struct.unpack_from(bo + "H", pixels, off)[0]
            left = struct.unpack_from(bo + "H", pixels, off - 2)[0]
            struct.pack_into(bo + "H", out, off, (cur - left) & 0xFFFF)
    return bytes(out)

#: BYTE ASCII SHORT LONG RATIONAL … UNDEFINED (7: raw bytes — JPEGTables)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}


def _read_ifd(
    data: bytes, bo: str, ifd_off: int | None = None
) -> tuple[dict[int, list[int]], int]:
    """One IFD as {tag: [values…]} plus the next-IFD offset; reads the
    first IFD (header pointer) unless ``ifd_off`` names another."""
    if ifd_off is None:
        (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF: IFD offset outside file")
    (n,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    pos = ifd_off + 2
    for _ in range(n):
        if pos + 12 > len(data):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, cnt = struct.unpack(bo + "HHI", data[pos : pos + 8])
        size = _TYPE_SIZES.get(typ, 0) * cnt
        if size == 0:
            pos += 12
            continue  # unknown type: skip the tag, spec-sanctioned
        if size <= 4:
            raw = data[pos + 8 : pos + 8 + size]
        else:
            (off,) = struct.unpack(bo + "I", data[pos + 8 : pos + 12])
            raw = data[off : off + size]
            if len(raw) != size:
                raise ValueError(f"truncated TIFF tag {tag} payload")
        if typ == 3:
            vals = list(struct.unpack(bo + f"{cnt}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{cnt}I", raw))
        elif typ in (1, 2, 7):
            vals = list(raw)
        else:  # RATIONAL: keep numerators; no baseline tag we read uses it
            vals = list(struct.unpack(bo + f"{2 * cnt}I", raw))[::2]
        tags[tag] = vals
        pos += 12
    (nxt,) = struct.unpack(bo + "I", data[pos : pos + 4])
    return tags, nxt


def _byte_order(data: bytes) -> str:
    if data[:4] == b"II*\x00":
        return "<"
    if data[:4] == b"MM\x00*":
        return ">"
    raise ValueError("not a TIFF payload")


def parse_tiff_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the first IFD — the metadata sniff."""
    bo = _byte_order(data)
    tags, _ = _read_ifd(data, bo)
    if 256 not in tags or 257 not in tags:
        raise ValueError("TIFF without ImageWidth/ImageLength")
    return int(tags[256][0]), int(tags[257][0])


def tiff_page_count(data: bytes) -> int:
    """Number of IFDs in the chain (multi-page TIFF, r12); loop-guarded
    so a malformed circular chain is a ValueError, not a hang."""
    bo = _byte_order(data)
    (off,) = struct.unpack(bo + "I", data[4:8])
    n = 0
    seen: set[int] = set()
    while off:
        if off in seen:
            raise ValueError("TIFF IFD chain loops")
        seen.add(off)
        _tags, off = _read_ifd(data, bo, off)
        n += 1
    return n


def decode_tiff(data: bytes, page: int = 0) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) of IFD ``page`` (default: the
    first — single-page files are the page-0 special case)."""
    bo = _byte_order(data)
    tags, nxt = _read_ifd(data, bo)
    for idx in range(int(page)):
        if nxt == 0:
            raise ValueError(f"TIFF has {idx + 1} page(s), page {page} requested")
        tags, nxt = _read_ifd(data, bo, nxt)
    comp = tags.get(259, [1])[0]
    if comp not in (1, 2, 3, 4, 5, 7, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {comp} (uncompressed/CCITT G3 and G4/LZW/"
            "JPEG/Deflate/PackBits implemented)"
        )
    # JPEGTables form (TIFF/EP tag 347, r12): one abbreviated
    # tables-only stream (SOI, DQT/DHT…, EOI) shared by every strip/tile,
    # merged into each abbreviated-image stream before decoding
    jpeg_tables = bytes(tags[347]) if (comp == 7 and 347 in tags) else None
    planar = tags.get(284, [1])[0]
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF planar configuration {planar} not supported")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8] * spp)
    bps0 = int(bps[0])
    if any(int(b) != bps0 for b in bps):
        raise NotImplementedError(f"TIFF mixed bits-per-sample {bps}")
    if bps0 not in (1, 4, 8, 16):
        raise NotImplementedError(f"TIFF bits-per-sample {bps0} (1/4/8/16 only)")
    if comp in (2, 3, 4):
        # CCITT is bilevel by definition (T.4 §1): one sample, one bit,
        # White/BlackIsZero photometrics only
        if bps0 != 1 or tags.get(277, [1])[0] != 1:
            raise ValueError(
                f"CCITT compression {comp} with bits {bps0} / "
                f"{tags.get(277, [1])[0]} samples — bilevel only"
            )
        if tags.get(262, [1])[0] not in (0, 1):
            raise ValueError(
                f"CCITT compression {comp} with photometric "
                f"{tags.get(262, [1])[0]} (0/1 only)"
            )
    if bps0 != 8:
        # r12: non-8-bit depths decode on the single-plane strip path —
        # bilevel (1), 16-color/level (4), and 16-bit gray (high-byte
        # reduction, the PNG-16 convention); the remaining combinations
        # stay named seams
        if spp != 1:
            raise NotImplementedError(
                f"TIFF {bps0}-bit with {spp} samples not supported"
            )
        if planar == 2:
            # PlanarConfiguration is meaningless at one sample per pixel
            # (TIFF 6.0: "this field is irrelevant if SamplesPerPixel is
            # 1") — r13: normalize instead of seaming
            planar = 1
        if 322 in tags or 324 in tags:
            # r13: sub-byte and 16-bit TILED gray assemble (byte-aligned
            # blit — spec tile widths are multiples of 16, so 1/4-bit
            # tile boundaries land on bytes); r14 adds CCITT tiles (each
            # tile an independent T.4/T.6 coding block of the full tw×tl
            # geometry, §15 + §11); JPEG stays 8-bit
            if comp not in (1, 2, 3, 4, 5, 8, 32946, 32773):
                raise NotImplementedError(
                    f"tiled {bps0}-bit TIFF with compression {comp} "
                    "not supported"
                )
        if predictor == 2 and bps0 != 16:
            # PERMANENT pin (r13): TIFF 6.0 §14 defines horizontal
            # differencing for 8-bit samples and the TechNote extension
            # covers 16/32 — sub-byte sample differencing has no spec
            # meaning, so a file claiming it is malformed, not a seam
            raise ValueError(
                f"predictor 2 with {bps0}-bit samples is not defined by "
                "TIFF 6.0 (8-bit) or the TechNote extension (16/32-bit)"
            )
        if comp == 7:
            raise NotImplementedError("JPEG-in-TIFF is 8-bit only")
        if bps0 == 16 and photo == 3:
            # PERMANENT pin (r13): TIFF 6.0 §5 restricts palette images
            # to BitsPerSample 4 or 8 — a 16-bit ColorMap index is
            # malformed, and the 16-bit high-byte reduction would look
            # up the wrong entries while labeling the result 'ok'
            raise ValueError(
                "16-bit palette TIFF is malformed (TIFF 6.0 limits "
                "PhotometricInterpretation 3 to 4/8-bit samples)"
            )
    if photo == 2 and spp == 3:
        channels = 3
    elif photo in (0, 1, 3) and spp == 1:
        # BlackIsZero / WhiteIsZero (inverted at the end) / palette
        channels = 1
    else:
        raise NotImplementedError(
            f"TIFF photometric {photo} with {spp} samples not supported"
        )
    cmap = None
    if photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * (1 << bps0):
            raise ValueError(f"palette TIFF without a 3x{1 << bps0} ColorMap")
    w, h = int(tags[256][0]), int(tags[257][0])
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate TIFF geometry {w}x{h}")
    if 322 in tags or 324 in tags:
        if planar == 2:
            # planar TILED (r12): the tile arrays hold all plane-0 tiles
            # row-major, then plane 1, … — each plane assembles like an
            # independent 1-sample tiled image and the planes interleave
            # to chunky, the same shape as the planar strip path below
            offs, counts = tags.get(324, []), tags.get(325, [])
            if len(offs) % channels:
                raise ValueError(
                    f"planar tiled TIFF: {len(offs)} tiles not divisible "
                    f"by {channels} planes"
                )
            tpp = len(offs) // channels
            planes = [
                _assemble_tiles(
                    data, tags, w, h, 1, comp, predictor, jpeg_tables,
                    offs=offs[p * tpp : (p + 1) * tpp],
                    counts=counts[p * tpp : (p + 1) * tpp],
                )
                for p in range(channels)
            ]
            inter = bytearray(w * h * channels)
            for p, plane in enumerate(planes):
                inter[p::channels] = plane
            return (w, h, *_apply_photometric(bytes(inter), photo, cmap))
        body = _assemble_tiles(
            data, tags, w, h, channels, comp, predictor, jpeg_tables,
            bps=bps0, bo=bo,
            t4_options=int(tags.get(292, [0])[0]),
            invert=photo == 1,
        )
        if bps0 != 8:
            body = _samples_to_bytes(body, w, h, bps0, bo, scale=photo != 3)
        return (w, h, *_apply_photometric(body, photo, cmap))
    offs = tags.get(273)
    counts = tags.get(279)
    if not offs or not counts or len(offs) != len(counts):
        raise ValueError("TIFF without consistent strip offsets/byte counts")
    rps = int(tags.get(278, [h])[0]) or h
    if planar == 2:
        # PlanarConfiguration 2 (r11): each sample plane stores its OWN
        # strip run (all plane-0 strips, then plane 1, then plane 2); each
        # plane decodes like an independent grayscale image (predictor
        # with spp=1 semantics) and the planes interleave to chunky RGB.
        spl = -(-h // rps)  # strips per plane
        if len(offs) != spl * channels:
            raise ValueError(
                f"planar TIFF expects {spl * channels} strips, has {len(offs)}"
            )
        planes = []
        for p in range(channels):
            plane = bytearray()
            for si in range(spl):
                o, c = offs[p * spl + si], counts[p * spl + si]
                chunk = data[o : o + c]
                if len(chunk) != c:
                    raise ValueError("truncated TIFF strip")
                rows = min(rps, h - si * rps)
                need_s = rows * w
                if comp == 5:
                    strip = bytearray(lzw_decode_tiff(chunk, need_s))
                    if predictor == 2:
                        _undiff_rows(strip, w, rows, 1)
                    plane += strip
                elif comp in (8, 32946):
                    strip = bytearray(_inflate_block(chunk, need_s))
                    if predictor == 2:
                        _undiff_rows(strip, w, rows, 1)
                    plane += strip
                elif comp == 32773:
                    plane += unpackbits(chunk, need_s)
                elif comp == 1:
                    if len(chunk) < need_s:
                        raise ValueError("truncated uncompressed planar strip")
                    plane += chunk[:need_s]
                else:
                    raise NotImplementedError("planar JPEG-in-TIFF not supported")
            planes.append(plane)
        inter = bytearray(w * h * channels)
        for p, plane in enumerate(planes):
            inter[p::channels] = plane
        return (w, h, *_apply_photometric(bytes(inter), photo, cmap))
    body = bytearray()
    for si, (o, c) in enumerate(zip(offs, counts)):
        chunk = data[o : o + c]
        if len(chunk) != c:
            raise ValueError("truncated TIFF strip")
        if comp == 1:
            # uncompressed strips need no row accounting — concatenate
            # (lenient to writers whose RowsPerStrip disagrees with the
            # strip arrays, which the compressed paths cannot be)
            body += chunk
            continue
        rows = min(rps, h - si * rps)
        if rows <= 0:
            raise ValueError("TIFF strip past image height")
        # decompressed strip size in FILE bytes: sub-byte rows pack
        # MSB-first and pad to byte boundaries (TIFF 6.0: rows begin on
        # byte boundaries); 16-bit samples take two
        need_s = rows * ((w * channels * bps0 + 7) // 8)
        # each strip decompresses INDEPENDENTLY (spec: compression state
        # never crosses strip boundaries), and the predictor undoes per row
        if comp == 7:
            # new-style JPEG-in-TIFF (tag 7): each strip is a complete
            # JPEG stream — or, with tag 347, an abbreviated-image stream
            # spliced with the shared tables — routed to the in-repo
            # baseline/progressive decoder.  Channel count must agree
            # with the IFD's contract.
            from simsearch_spark.multimodal.jpeg import decode_jpeg

            stream = _merge_jpegtables(jpeg_tables, chunk) if jpeg_tables else chunk
            jw, jh, jch, jpix = decode_jpeg(stream)
            if (jw, jch) != (w, channels) or jh != rows:
                raise ValueError(
                    f"JPEG strip geometry {jw}x{jh}x{jch} != IFD {w}x{rows}x{channels}"
                )
            body += jpix
        elif comp == 5:
            strip = bytearray(lzw_decode_tiff(chunk, need_s))
            if predictor == 2:
                if bps0 == 16:
                    _undiff_rows16(strip, w, rows, bo)
                else:
                    _undiff_rows(strip, w, rows, channels)
            body += strip
        elif comp in (8, 32946):
            # Deflate (r13, TIFF TechNote 2 tag 8 + the legacy 32946):
            # zlib streams per strip, stdlib inflate — the PNG discipline
            strip = bytearray(_inflate_block(chunk, need_s))
            if predictor == 2:
                if bps0 == 16:
                    _undiff_rows16(strip, w, rows, bo)
                else:
                    _undiff_rows(strip, w, rows, channels)
            body += strip
        elif comp in (2, 3, 4):
            # CCITT G3/G4 (r13, multimodal/ccitt.py): each strip is an
            # independent coding block (G4's first reference line resets
            # to all-white per strip, TIFF 6.0 §11); photometric 1 flips
            # the packed bits so white lands on the BlackIsZero max
            from simsearch_spark.multimodal.ccitt import ccitt_decode

            body += ccitt_decode(
                chunk, w, rows, comp,
                t4_options=int(tags.get(292, [0])[0]),
                invert=photo == 1,
            )
        else:  # 32773
            if predictor == 2:
                raise NotImplementedError("predictor 2 with PackBits not supported")
            body += unpackbits(chunk, need_s)
    if bps0 != 8:
        body = _samples_to_bytes(bytes(body), w, h, bps0, bo, scale=photo != 3)
    need = w * h * channels
    if len(body) < need:
        raise ValueError(f"TIFF strips hold {len(body)} B < {need} B of pixels")
    return (w, h, *_apply_photometric(bytes(body[:need]), photo, cmap))


def _samples_to_bytes(
    raw: bytes, w: int, h: int, bps: int, bo: str, scale: bool
) -> bytes:
    """Assembled single-plane strip bytes at a non-8-bit depth → one
    byte per sample (r12).  16-bit keeps the high byte (the PNG-16 /
    ColorMap reduction convention, respecting the file byte order);
    1/4-bit rows unpack MSB-first from byte-aligned rows, then
    BIT-REPLICATE to 8-bit gray (×255 / ×17 — exact) unless the values
    are palette indices (``scale=False``)."""
    if bps == 16:
        need = w * h * 2
        if len(raw) < need:
            raise ValueError(f"TIFF strips hold {len(raw)} B < {need} B of pixels")
        hi = 0 if bo == ">" else 1
        return raw[hi : hi + need : 2]
    stride = (w * bps + 7) // 8
    if len(raw) < stride * h:
        raise ValueError(
            f"TIFF strips hold {len(raw)} B < {stride * h} B of pixels"
        )
    out = bytearray(w * h)
    mul = (255 // ((1 << bps) - 1)) if scale else 1
    for y in range(h):
        base = y * stride
        for x in range(w):
            if bps == 4:
                b = raw[base + (x >> 1)]
                v = (b >> 4) if x % 2 == 0 else (b & 15)
            else:
                v = (raw[base + (x >> 3)] >> (7 - (x & 7))) & 1
            out[y * w + x] = v * mul
    return bytes(out)


def _apply_photometric(
    body: bytes, photo: int, cmap: list[int] | None
) -> tuple[int, bytes]:
    """(channels, pixels) after photometric post-processing: WhiteIsZero
    inversion or the 16-bit-ColorMap palette expansion (gray-collapse
    convention shared with the GIF/BMP decoders).  ``body`` is the
    assembled sample plane (1 B/sample gray or chunky RGB)."""
    if photo == 0:  # WhiteIsZero: 0 is white — invert to BlackIsZero gray
        return 1, bytes(255 - v for v in body)
    if photo == 3:
        # ColorMap entries are 16-bit (0 = black, 65535 = max) in plane
        # order R[n] G[n] B[n] for an n = 2^bps entry table; >>8 is the
        # spec's 8-bit reduction.
        n = len(cmap) // 3
        r = [v >> 8 for v in cmap[0:n]]
        g = [v >> 8 for v in cmap[n : 2 * n]]
        b = [v >> 8 for v in cmap[2 * n : 3 * n]]
        used = set(body)
        if all(r[i] == g[i] == b[i] for i in used):
            lut = bytes(r)
            return 1, bytes(lut[i] for i in body)
        out = bytearray(3 * len(body))
        for p, i in enumerate(body):
            out[3 * p] = r[i]
            out[3 * p + 1] = g[i]
            out[3 * p + 2] = b[i]
        return 3, bytes(out)
    return (3 if photo == 2 else 1), body


def _merge_jpegtables(tables: bytes, stream: bytes) -> bytes:
    """TIFF/EP tag 347: splice the shared abbreviated-tables stream
    (SOI, table segments, EOI) into one strip/tile's abbreviated-image
    stream right after its SOI.  Tables repeated inside the image stream
    legitimately override — our sequential JPEG parser applies segments
    in order, which is exactly the spec's override rule."""
    t = tables.rstrip(b"\x00")  # writers may pad after EOI
    if len(t) < 4 or t[:2] != b"\xff\xd8" or t[-2:] != b"\xff\xd9":
        raise ValueError("JPEGTables stream must be SOI .. EOI")
    if stream[:2] != b"\xff\xd8":
        raise ValueError("JPEG strip/tile without SOI")
    return stream[:2] + t[2:-2] + stream[2:]


def _inflate_block(chunk: bytes, need: int) -> bytes:
    """One Deflate strip/tile (zlib wrapper per TIFF TechNote 2) →
    exactly ``need`` decompressed bytes."""
    try:
        out = zlib.decompress(chunk)
    except zlib.error as e:
        raise ValueError(f"malformed Deflate TIFF block: {e}") from e
    if len(out) < need:
        raise ValueError(
            f"Deflate TIFF block inflates to {len(out)} B < {need} B"
        )
    return out[:need]


def _assemble_tiles(
    data: bytes,
    tags: dict[int, list[int]],
    w: int,
    h: int,
    channels: int,
    comp: int,
    predictor: int,
    jpeg_tables: bytes | None = None,
    offs: list[int] | None = None,
    counts: list[int] | None = None,
    bps: int = 8,
    bo: str = "<",
    t4_options: int = 0,
    invert: bool = False,
) -> bytes:
    """Tiled TIFF assembly (TIFF 6.0 §15): TileWidth/TileLength (322/323,
    multiples of 16 per spec — not enforced, writers vary), offsets/byte
    counts (324/325) in row-major tile order.  Every tile is a FULL
    tw×tl block (edge tiles padded); each decompresses independently and
    the predictor undoes per TILE row before the blit clips the padding.
    ``offs``/``counts`` override the tags (the planar path passes one
    plane's slice of the tile arrays, r12).
    """
    if 322 not in tags or 323 not in tags or 324 not in tags or 325 not in tags:
        raise ValueError("tiled TIFF without TileWidth/TileLength/Offsets/ByteCounts")
    tw, tl = int(tags[322][0]), int(tags[323][0])
    if tw <= 0 or tl <= 0:
        raise ValueError(f"degenerate TIFF tile geometry {tw}x{tl}")
    if offs is None:
        offs, counts = tags[324], tags[325]
    across = -(-w // tw)
    down = -(-h // tl)
    if len(offs) != across * down or len(counts) != len(offs):
        raise ValueError(
            f"tiled TIFF expects {across * down} tiles, has {len(offs)} offsets"
        )
    # r13: non-8-bit single-plane tiles — rows pack at bit depth ``bps``
    # and the blit works in whole bytes, which requires tile boundaries
    # on byte boundaries (guaranteed by the spec's multiple-of-16 tile
    # widths; enforced for writers that deviate)
    if bps in (1, 4) and (tw * bps) % 8:
        raise NotImplementedError(
            f"tiled {bps}-bit TIFF with non-byte-aligned tile width {tw}"
        )
    t_stride = (tw * bps * channels + 7) // 8
    w_stride = (w * bps * channels + 7) // 8
    tile_bytes = t_stride * tl
    body = bytearray(w_stride * h)
    for ti, (o, c) in enumerate(zip(offs, counts)):
        chunk = data[o : o + c]
        if len(chunk) != c:
            raise ValueError("truncated TIFF tile")
        if comp in (5, 8, 32946):
            tile = bytearray(
                lzw_decode_tiff(chunk, tile_bytes)
                if comp == 5
                else _inflate_block(chunk, tile_bytes)
            )
            if predictor == 2:
                if bps == 16:
                    _undiff_rows16(tile, tw, tl, bo)
                else:
                    _undiff_rows(tile, tw, tl, channels)
        elif comp == 32773:
            if predictor == 2:
                raise NotImplementedError("predictor 2 with PackBits not supported")
            tile = bytearray(unpackbits(chunk, tile_bytes))
        elif comp in (2, 3, 4):
            # CCITT tiles (r14): every tile is an INDEPENDENT T.4/T.6
            # coding block of the full tw×tl geometry — G4's reference
            # line resets to all-white per tile exactly as it does per
            # strip (TIFF 6.0 §11 applied to §15 tiles); edge padding
            # is clipped by the blit like every other compression
            from simsearch_spark.multimodal.ccitt import ccitt_decode

            tile = bytearray(
                ccitt_decode(
                    chunk, tw, tl, comp, t4_options=t4_options, invert=invert
                )
            )
        elif comp == 7:
            # tiled JPEG-in-TIFF (r12): every tile is a complete (or
            # JPEGTables-abbreviated) JPEG stream of the FULL tile
            # geometry — edge tiles included, per §15
            from simsearch_spark.multimodal.jpeg import decode_jpeg

            stream = _merge_jpegtables(jpeg_tables, chunk) if jpeg_tables else chunk
            jw, jh, jch, jpix = decode_jpeg(stream)
            if (jw, jh, jch) != (tw, tl, channels):
                raise ValueError(
                    f"JPEG tile geometry {jw}x{jh}x{jch} != "
                    f"tile contract {tw}x{tl}x{channels}"
                )
            tile = bytearray(jpix)
        else:
            if len(chunk) < tile_bytes:
                raise ValueError("truncated uncompressed TIFF tile")
            tile = bytearray(chunk[:tile_bytes])
        ty, tx = divmod(ti, across)
        x0, y0 = tx * tw, ty * tl
        cols = min(tw, w - x0)
        nbytes = (cols * bps * channels + 7) // 8
        x_off = x0 * bps * channels // 8  # byte-aligned by the gate above
        for row in range(min(tl, h - y0)):
            src = row * t_stride
            dst = (y0 + row) * w_stride + x_off
            body[dst : dst + nbytes] = tile[src : src + nbytes]
    return bytes(body)


def encode_tiff(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    big_endian: bool = False,
    compression: str | None = None,
    predictor: int = 1,
    bits_per_sample: int = 8,
) -> bytes:
    """Top-down row-major pixels → single-strip TIFF (gray BlackIsZero or
    chunky RGB), little-endian by default.  ``compression``: None
    (baseline), ``"packbits"``, ``"lzw"``, or ``"deflate"`` (r13, zlib
    tag 8); ``predictor=2`` (horizontal differencing) is valid with LZW
    and Deflate.  ``bits_per_sample`` (r12,
    gray only): 16 widens each 8-bit value to ``v*257`` (exact); 4/1
    pack rows MSB-first and require bit-replication-representable
    values (multiples of 17 / pure 0-255).  All modes lossless."""
    if channels not in (1, 3):
        raise ValueError(f"TIFF encode supports 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}x{channels}")
    if compression not in (None, "packbits", "lzw", "deflate"):
        raise ValueError(f"TIFF compression {compression!r} not supported")
    if predictor == 2 and compression not in ("lzw", "deflate"):
        raise ValueError("predictor 2 requires LZW or Deflate compression")
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor} not supported")
    if bits_per_sample not in (1, 4, 8, 16):
        raise ValueError(f"TIFF encode bits-per-sample {bits_per_sample}")
    if bits_per_sample != 8 and channels != 1:
        raise ValueError("non-8-bit TIFF encode is single-channel")
    if predictor == 2 and bits_per_sample not in (8, 16):
        raise ValueError("predictor 2 encodes at 8 or 16 bits")
    body = pixels
    if bits_per_sample == 16:
        bo0 = ">" if big_endian else "<"
        body = struct.pack(f"{bo0}{len(pixels)}H", *(v * 257 for v in pixels))
        if predictor == 2:
            body = _diff_rows16(body, width, height, bo0)
    elif bits_per_sample in (1, 4):
        mul = 255 // ((1 << bits_per_sample) - 1)
        if any(v % mul for v in pixels):
            raise ValueError(
                f"{bits_per_sample}-bit TIFF requires multiples of {mul}"
            )
        stride = (width * bits_per_sample + 7) // 8
        packed = bytearray(stride * height)
        for y in range(height):
            for x in range(width):
                v = pixels[y * width + x] // mul
                if bits_per_sample == 4:
                    packed[y * stride + (x >> 1)] |= v << (0 if x & 1 else 4)
                else:
                    packed[y * stride + (x >> 3)] |= v << (7 - (x & 7))
        body = bytes(packed)
    if predictor == 2 and bits_per_sample == 8:
        body = _diff_rows(body, width, height, channels)
    comp_tag = 1
    if compression == "packbits":
        body, comp_tag = packbits(body), 32773
    elif compression == "lzw":
        body, comp_tag = lzw_encode_tiff(body), 5
    elif compression == "deflate":
        body, comp_tag = zlib.compress(body), 8
    bo = ">" if big_endian else "<"
    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, 4B value)

    def short(v: int) -> bytes:
        # inline values are LEFT-justified in the 4-byte field, either order
        return struct.pack(bo + "HH", v, 0)

    def long_(v: int) -> bytes:
        return struct.pack(bo + "I", v)

    # layout: header(8) + IFD + bps-array (rgb only) + strip
    n_entries = 9 + (1 if predictor == 2 else 0)
    ifd_size = 2 + 12 * n_entries + 4
    bps_off = 8 + ifd_size
    bps_extra = 6 if channels == 3 else 0
    strip_off = bps_off + bps_extra
    entries.append((256, 3, 1, short(width)))
    entries.append((257, 3, 1, short(height)))
    if channels == 3:
        entries.append((258, 3, 3, long_(bps_off)))
    else:
        entries.append((258, 3, 1, short(bits_per_sample)))
    entries.append((259, 3, 1, short(comp_tag)))
    entries.append((262, 3, 1, short(2 if channels == 3 else 1)))
    entries.append((273, 4, 1, long_(strip_off)))       # one strip
    entries.append((277, 3, 1, short(channels)))
    entries.append((278, 3, 1, short(height)))          # rows per strip
    entries.append((279, 4, 1, long_(len(body))))
    if predictor == 2:
        entries.append((317, 3, 1, short(2)))
    out = bytearray()
    out += (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(bo + "I", 8)
    out += struct.pack(bo + "H", n_entries)
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val
    out += struct.pack(bo + "I", 0)                     # no next IFD
    if channels == 3:
        out += struct.pack(bo + "HHH", 8, 8, 8)
    out += body
    return bytes(out)


def encode_tiff_ccitt(
    width: int,
    height: int,
    pixels: bytes,
    compression: int = 4,
    big_endian: bool = False,
) -> bytes:
    """Two-tone gray rows ({0, 255} bytes, 255 = white) → bilevel CCITT
    TIFF under photometric 0 (WhiteIsZero, the fax norm): compression 2
    (modified Huffman, byte-aligned rows), 3 (T.4 G3 1D, EOL per line,
    T4Options=0) or 4 (T.6 G4 MMR, EOFB-terminated).  Single strip;
    exact round trip through ``decode_tiff`` (tests/test_ccitt.py)."""
    from simsearch_spark.multimodal.ccitt import (
        ccitt_encode_g3_1d,
        ccitt_encode_g3_eol,
        ccitt_encode_g4,
        rows_to_bits,
    )

    if compression not in (2, 3, 4):
        raise ValueError(f"CCITT compression {compression} (2/3/4 only)")
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}")
    lines = rows_to_bits(bytes(pixels), width, height)
    body = {
        2: ccitt_encode_g3_1d,
        3: ccitt_encode_g3_eol,
        4: ccitt_encode_g4,
    }[compression](lines, width)

    bo = ">" if big_endian else "<"

    def short(v: int) -> bytes:
        return struct.pack(bo + "HH", v, 0)

    def long_(v: int) -> bytes:
        return struct.pack(bo + "I", v)

    entries: list[tuple[int, int, int, bytes]] = [
        (256, 3, 1, short(width)),
        (257, 3, 1, short(height)),
        (258, 3, 1, short(1)),
        (259, 3, 1, short(compression)),
        (262, 3, 1, short(0)),          # WhiteIsZero
        (277, 3, 1, short(1)),
        (278, 3, 1, short(height)),
        (279, 4, 1, long_(len(body))),
    ]
    if compression == 3:
        entries.append((292, 4, 1, long_(0)))  # T4Options: 1D, no fill
    n_entries = len(entries) + 1                # + the strip offset
    ifd_size = 2 + 12 * n_entries + 4
    strip_off = 8 + ifd_size
    entries.append((273, 4, 1, long_(strip_off)))
    out = bytearray()
    out += (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(bo + "I", 8)
    out += struct.pack(bo + "H", n_entries)
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val
    out += struct.pack(bo + "I", 0)
    out += body
    return bytes(out)


def _extract_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a complete JPEG stream into the TIFF/EP pair: the
    abbreviated-tables stream (SOI + every DQT/DHT + EOI — the tag-347
    payload) and the abbreviated-image stream (SOI + the rest).  Inverse
    of ``_merge_jpegtables`` up to segment order, to which a sequential
    JPEG parser is insensitive."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = bytearray(b"\xff\xd8")
    image = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("JPEG segment desync while splitting tables")
        m = stream[pos + 1]
        if m == 0xDA:  # SOS header + entropy + EOI all stay image-side
            image += stream[pos:]
            break
        (ln,) = struct.unpack(">H", stream[pos + 2 : pos + 4])
        seg = stream[pos : pos + 2 + ln]
        if m in (0xDB, 0xC4):
            tables += seg
        else:
            image += seg
        pos += 2 + ln
    tables += b"\xff\xd9"
    return bytes(tables), bytes(image)


def encode_tiff_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 85,
    rows_per_strip: int | None = None,
    jpegtables: bool = False,
) -> bytes:
    """Compression-7 (new-style JPEG-in-TIFF) writer, r12: each strip is
    an independent JPEG stream from the in-repo encoder.  With
    ``jpegtables=True`` the shared DQT/DHT segments are factored into ONE
    tag-347 payload (the TIFF/EP abbreviated form real writers emit —
    identical tables per strip since quality is constant) and the strips
    store abbreviated image streams.  Gray (photometric 1) or chunky RGB.
    JPEG is lossy in general; callers wanting closed-form oracles use
    block-constant pixels (the q85 exactness property)."""
    from simsearch_spark.multimodal.jpeg import encode_jpeg

    if channels not in (1, 3):
        raise ValueError(f"TIFF-JPEG encode supports 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}x{channels}")
    rps = int(rows_per_strip or height)
    strips = []
    for y0 in range(0, height, rps):
        rows = min(rps, height - y0)
        strips.append(
            encode_jpeg(
                width,
                rows,
                channels,
                pixels[y0 * width * channels : (y0 + rows) * width * channels],
                quality=quality,
            )
        )
    tables = None
    if jpegtables:
        pairs = [_extract_jpeg_tables(s) for s in strips]
        tables = pairs[0][0]  # constant quality → identical DQT/DHT per strip
        strips = [im for _t, im in pairs]

    bo = "<"
    entries: list[tuple[int, int, int, bytes]] = []
    n_strips = len(strips)
    multi = n_strips > 1
    n_entries = 9 + (1 if tables is not None else 0)
    ifd_size = 2 + 12 * n_entries + 4
    bps_off = 8 + ifd_size
    bps_extra = 6 if channels == 3 else 0
    arr_off = bps_off + bps_extra
    arr_extra = 8 * n_strips if multi else 0
    data_off = arr_off + arr_extra
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    entries.append((256, 3, 1, struct.pack(bo + "HH", width, 0)))
    entries.append((257, 3, 1, struct.pack(bo + "HH", height, 0)))
    if channels == 3:
        entries.append((258, 3, 3, struct.pack(bo + "I", bps_off)))
    else:
        entries.append((258, 3, 1, struct.pack(bo + "HH", 8, 0)))
    entries.append((259, 3, 1, struct.pack(bo + "HH", 7, 0)))
    entries.append((262, 3, 1, struct.pack(bo + "HH", 2 if channels == 3 else 1, 0)))
    entries.append((277, 3, 1, struct.pack(bo + "HH", channels, 0)))
    entries.append((278, 3, 1, struct.pack(bo + "HH", rps, 0)))
    if multi:
        entries.append((273, 4, n_strips, struct.pack(bo + "I", arr_off)))
        entries.append(
            (279, 4, n_strips, struct.pack(bo + "I", arr_off + 4 * n_strips))
        )
    else:
        entries.append((273, 4, 1, struct.pack(bo + "I", offs[0])))
        entries.append((279, 4, 1, struct.pack(bo + "I", len(strips[0]))))
    if tables is not None:
        if len(tables) <= 4:
            entries.append((347, 7, len(tables), tables.ljust(4, b"\x00")))
        else:
            entries.append((347, 7, len(tables), struct.pack(bo + "I", pos)))
    out = bytearray(b"II*\x00" + struct.pack(bo + "I", 8))
    out += struct.pack(bo + "H", n_entries)
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val
    out += struct.pack(bo + "I", 0)
    if channels == 3:
        out += struct.pack(bo + "HHH", 8, 8, 8)
    if multi:
        out += struct.pack(bo + f"{n_strips}I", *offs)
        out += struct.pack(bo + f"{n_strips}I", *[len(s) for s in strips])
    for s in strips:
        out += s
    if tables is not None and len(tables) > 4:
        out += tables
    return bytes(out)


def encode_tiff_multipage(
    pages: list[tuple[int, int, int, bytes]],
    big_endian: bool = False,
    compression: str | None = None,
    predictor: int = 1,
) -> bytes:
    """Multi-page TIFF (r12): each ``(width, height, channels, pixels)``
    page is encoded with the single-page layout, relocated, and chained
    through the next-IFD pointers.  Page blocks after the first drop the
    8-byte header; their two offset-valued IFD entries (273 StripOffsets
    always, 258 BitsPerSample when RGB stores the 3-SHORT array
    out-of-line) shift by the block's displacement."""
    if not pages:
        raise ValueError("multi-page TIFF needs at least one page")
    bo = ">" if big_endian else "<"
    out = bytearray()
    next_ptr_pos = 0
    for i, (w, h, c, pix) in enumerate(pages):
        blob = bytearray(encode_tiff(w, h, c, pix, big_endian, compression, predictor))
        n_entries = 9 + (1 if predictor == 2 else 0)
        tags_sorted = sorted(
            [256, 257, 258, 259, 262, 273, 277, 278, 279]
            + ([317] if predictor == 2 else [])
        )
        if i == 0:
            base = 8  # page-0 IFD position (right after the header)
            out += blob
        else:
            base = len(out)
            delta = base - 8
            for k, tag in enumerate(tags_sorted):
                if tag == 273 or (tag == 258 and c == 3):
                    vpos = 8 + 2 + 12 * k + 8
                    (v,) = struct.unpack(bo + "I", blob[vpos : vpos + 4])
                    struct.pack_into(bo + "I", blob, vpos, v + delta)
            out += blob[8:]
            struct.pack_into(bo + "I", out, next_ptr_pos, base)
        next_ptr_pos = base + 2 + 12 * n_entries
    return bytes(out)
