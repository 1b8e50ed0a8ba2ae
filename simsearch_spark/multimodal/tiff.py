"""Baseline TIFF 6.0 codec — uncompressed grayscale/RGB strips, both byte
orders.  From scratch, dependency-free, like the sibling codecs (no
reference-engine counterpart — LLM-pipeline surface, SURVEY.md §6).
Public spec: Adobe TIFF 6.0 (1992), Part 1 (Baseline).

Scope:
- DECODE: II (little-endian) and MM (big-endian) headers, one IFD,
  SHORT/LONG tag values (inline or offset), multi-strip assembly,
  PhotometricInterpretation 1 (BlackIsZero, 8-bit gray) and 2 (RGB,
  8-bit/sample), PlanarConfiguration 1 (chunky).  TIFF rows are top-down
  — no flip, unlike BMP/DIB.
- Named NotImplementedError seams: any Compression != 1 (LZW/PackBits/
  JPEG-in-TIFF), tiled images, planar separation, WhiteIsZero/palette
  photometrics, other bit depths, multi-page (a second IFD).
- ENCODE: little-endian, single strip, BlackIsZero gray or chunky RGB.
  Lossless, so closed-form pixel oracles stay codec-invariant.
"""

from __future__ import annotations

import struct

__all__ = ["encode_tiff", "decode_tiff", "parse_tiff_header"]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_ifd(data: bytes, bo: str) -> tuple[dict[int, list[int]], int]:
    """First IFD as {tag: [values…]} plus the next-IFD offset."""
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
        elif typ in (1, 2):
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


def decode_tiff(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) of a baseline uncompressed TIFF."""
    bo = _byte_order(data)
    tags, nxt = _read_ifd(data, bo)
    if nxt != 0:
        raise NotImplementedError("multi-page TIFF not supported")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF not supported")
    comp = tags.get(259, [1])[0]
    if comp != 1:
        raise NotImplementedError(f"TIFF compression {comp} (uncompressed only)")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar TIFF not supported")
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8] * spp)
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"TIFF bits-per-sample {bps} (8 only)")
    if photo == 2 and spp == 3:
        channels = 3
    elif photo == 1 and spp == 1:
        channels = 1
    else:
        raise NotImplementedError(
            f"TIFF photometric {photo} with {spp} samples not supported"
        )
    w, h = int(tags[256][0]), int(tags[257][0])
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate TIFF geometry {w}x{h}")
    offs = tags.get(273)
    counts = tags.get(279)
    if not offs or not counts or len(offs) != len(counts):
        raise ValueError("TIFF without consistent strip offsets/byte counts")
    body = bytearray()
    for o, c in zip(offs, counts):
        chunk = data[o : o + c]
        if len(chunk) != c:
            raise ValueError("truncated TIFF strip")
        body += chunk
    need = w * h * channels
    if len(body) < need:
        raise ValueError(f"TIFF strips hold {len(body)} B < {need} B of pixels")
    return w, h, channels, bytes(body[:need])  # rows are already top-down


def encode_tiff(
    width: int, height: int, channels: int, pixels: bytes, big_endian: bool = False
) -> bytes:
    """Top-down row-major pixels → single-strip baseline TIFF (gray
    BlackIsZero or chunky RGB), little-endian by default."""
    if channels not in (1, 3):
        raise ValueError(f"TIFF encode supports 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}x{channels}")
    bo = ">" if big_endian else "<"
    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, 4B value)

    def short(v: int) -> bytes:
        # inline values are LEFT-justified in the 4-byte field, either order
        return struct.pack(bo + "HH", v, 0)

    def long_(v: int) -> bytes:
        return struct.pack(bo + "I", v)

    # layout: header(8) + IFD + bps-array (rgb only) + strip
    n_entries = 9
    ifd_size = 2 + 12 * n_entries + 4
    bps_off = 8 + ifd_size
    bps_extra = 6 if channels == 3 else 0
    strip_off = bps_off + bps_extra
    entries.append((256, 3, 1, short(width)))
    entries.append((257, 3, 1, short(height)))
    if channels == 3:
        entries.append((258, 3, 3, long_(bps_off)))
    else:
        entries.append((258, 3, 1, short(8)))
    entries.append((259, 3, 1, short(1)))               # uncompressed
    entries.append((262, 3, 1, short(2 if channels == 3 else 1)))
    entries.append((273, 4, 1, long_(strip_off)))       # one strip
    entries.append((277, 3, 1, short(channels)))
    entries.append((278, 3, 1, short(height)))          # rows per strip
    entries.append((279, 4, 1, long_(len(pixels))))
    out = bytearray()
    out += (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(bo + "I", 8)
    out += struct.pack(bo + "H", n_entries)
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val
    out += struct.pack(bo + "I", 0)                     # no next IFD
    if channels == 3:
        out += struct.pack(bo + "HHH", 8, 8, 8)
    out += pixels
    return bytes(out)
