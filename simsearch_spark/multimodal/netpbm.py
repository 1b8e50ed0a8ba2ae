"""Dependency-free Netpbm codec, r12 — the plainest real image format,
still everywhere in vision corpora.

Scope (the WHOLE classic family now): PGM P2/P5 gray, PPM P3/P6 RGB at
any legal maxval 1..65535 (two-byte big-endian raster samples above 255
per the pgm/ppm specs), and PBM P1/P4 bitmaps (MSB-first packed rows for
P4; P1 digits legally need NO separating whitespace).  Headers are
whitespace/comment-tolerant per the netpbm format specs.  Samples scale
to 8-bit with the spec reference implementation's round-half-away
``(v*255*2+mx)//(2*mx)``; maxval 65535 = 257*255 makes ``v*257``
round-trip 8-bit values exactly, which keeps the closed-form pixel
oracles codec-invariant for the 16-bit lane.  PBM's 1 bit is BLACK (0
after scaling) and 0 is WHITE (255) — inverted vs every other format
here, per the pbm spec.  The reference engine has no media operators
(LLM-pipeline extension surface).
"""

from __future__ import annotations

__all__ = ["encode_netpbm", "decode_netpbm", "encode_pam", "parse_netpbm_header"]

_CHANNELS = {b"P1": 1, b"P4": 1, b"P2": 1, b"P5": 1, b"P3": 3, b"P6": 3}
_BITMAP = (b"P1", b"P4")


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
    if data[:2] == b"P7":
        w, h, _d, _mx, _pos = _pam_header(data)
        return w, h
    _m, w, h, _mx, _pos = _header(data)
    return w, h


def _pam_header(data: bytes) -> tuple[int, int, int, int, int]:
    """PAM (P7) header: token pairs up to ENDHDR (pam spec) —
    (width, height, depth, maxval, raster_pos)."""
    if data[:2] != b"P7":
        raise ValueError("not a PAM payload")
    pos = 2
    fields: dict[bytes, int] = {}
    tupltype = b""
    while True:
        # one header LINE at a time (comments start with '#')
        nl = data.find(b"\n", pos)
        if nl < 0:
            raise ValueError("truncated PAM header (no ENDHDR)")
        line = data[pos:nl].strip()
        pos = nl + 1
        if not line or line.startswith(b"#"):
            continue
        parts = line.split(None, 1)
        key = parts[0].upper()
        if key == b"ENDHDR":
            break
        if key == b"TUPLTYPE":
            tupltype = (tupltype + b" " + parts[1]).strip() if len(parts) > 1 else tupltype
            continue
        if key in (b"WIDTH", b"HEIGHT", b"DEPTH", b"MAXVAL"):
            if len(parts) < 2:
                raise ValueError(f"PAM header {key.decode()} without a value")
            try:
                fields[key] = int(parts[1])
            except ValueError as e:
                raise ValueError(f"malformed PAM header line {line!r}") from e
        # unknown keys are skipped (forward-compatible per spec)
    for k in (b"WIDTH", b"HEIGHT", b"DEPTH", b"MAXVAL"):
        if k not in fields:
            raise ValueError(f"PAM header missing {k.decode()}")
    w, h, d, mx = (fields[k] for k in (b"WIDTH", b"HEIGHT", b"DEPTH", b"MAXVAL"))
    if w <= 0 or h <= 0 or mx <= 0 or mx > 65535:
        raise ValueError(f"degenerate PAM header {w}x{h} maxval {mx}")
    if d not in (1, 2, 3, 4):
        raise NotImplementedError(
            f"PAM depth {d} (GRAYSCALE/RGB with or without ALPHA only)"
        )
    # a declared tuple type must agree with the depth (r13: ALPHA tuples
    # decode — depth 2 = GRAYSCALE_ALPHA, 4 = RGB_ALPHA, the PNG
    # channel-count convention); an inconsistent pair is malformed
    expect = {
        b"BLACKANDWHITE": 1, b"GRAYSCALE": 1, b"RGB": 3,
        b"BLACKANDWHITE_ALPHA": 2, b"GRAYSCALE_ALPHA": 2, b"RGB_ALPHA": 4,
    }.get(tupltype)
    if tupltype and expect is not None and expect != d:
        raise ValueError(
            f"PAM depth {d} contradicts tupltype "
            f"{tupltype.decode(errors='replace')!r}"
        )
    if tupltype and expect is None:
        # ANY unknown tuple type (CMYK, vendor extensions, …) is a named
        # seam — interpreting its planes as gray/RGB(+alpha) would be a
        # wrong decode labeled 'ok' (review r13)
        raise NotImplementedError(
            f"PAM tupltype {tupltype.decode(errors='replace')!r}"
        )
    return w, h, d, mx, pos


def _header(data: bytes) -> tuple[bytes, int, int, int, int]:
    magic = data[:2]
    if magic not in _CHANNELS:
        raise ValueError("not a netpbm payload")
    # PBM has no maxval field — its samples are the bits themselves
    n_toks = 2 if magic in _BITMAP else 3
    toks, pos = _tokens(data, n_toks, 2)
    w, h = int(toks[0]), int(toks[1])
    mx = 1 if magic in _BITMAP else int(toks[2])
    if w <= 0 or h <= 0 or mx <= 0:
        raise ValueError(f"degenerate netpbm header {w}x{h} maxval {mx}")
    if mx > 65535:
        raise ValueError(f"netpbm maxval {mx} > 65535 is illegal")
    return magic, w, h, mx, pos


def _p1_bits(data: bytes, n: int, pos: int) -> list[int]:
    """P1 raster: ASCII 0/1 digits, whitespace OPTIONAL between them
    (the pbm spec's one token-grammar exception), comments still legal."""
    out: list[int] = []
    i = pos
    while len(out) < n and i < len(data):
        b = data[i]
        if b == ord("#"):
            while i < len(data) and data[i] not in (10, 13):
                i += 1
            continue
        if b in (ord("0"), ord("1")):
            out.append(b - ord("0"))
        elif not data[i : i + 1].isspace():
            raise ValueError(f"P1 raster byte {b!r} is not 0/1/whitespace")
        i += 1
    if len(out) < n:
        raise ValueError(f"P1 raster holds {len(out)} bits != {n}")
    return out


def decode_netpbm(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, row-major 8-bit pixels).  Values scale
    by 255/maxval with round-half-away (integer-exact when maxval is 255
    or 65535-with-v*257 samples — the lanes the fixtures use); PBM bits
    map 1→0 (black), 0→255 (white) per spec.  P7/PAM (r12) decodes
    GRAYSCALE and RGB tuples, binary raster only per spec."""
    if data[:2] == b"P7":
        w, h, ch, mx, pos = _pam_header(data)
        n = w * h * ch
        width_b = 2 if mx > 255 else 1
        raster = data[pos : pos + n * width_b]
        if len(raster) != n * width_b:
            raise ValueError(f"PAM raster holds {len(raster)} B != {n * width_b}")
        if width_b == 2:
            vals = [(raster[2 * i] << 8) | raster[2 * i + 1] for i in range(n)]
        else:
            vals = list(raster)
        if any(v > mx for v in vals):
            raise ValueError("PAM sample exceeds maxval")
        if mx != 255:
            vals = [(v * 255 * 2 + mx) // (2 * mx) for v in vals]
        return w, h, ch, bytes(vals)
    magic, w, h, mx, pos = _header(data)
    ch = _CHANNELS[magic]
    if magic in _BITMAP:
        if magic == b"P4":
            # packed rows, MSB first, each row padded to a byte boundary
            stride = (w + 7) // 8
            raster = data[pos + 1 : pos + 1 + stride * h]
            if len(raster) != stride * h:
                raise ValueError(
                    f"P4 raster holds {len(raster)} B != {stride * h}"
                )
            bits = [
                (raster[y * stride + (x >> 3)] >> (7 - (x & 7))) & 1
                for y in range(h)
                for x in range(w)
            ]
        else:
            bits = _p1_bits(data, w * h, pos)
        return w, h, 1, bytes(255 * (1 - b) for b in bits)
    n = w * h * ch
    if magic in (b"P5", b"P6"):
        # exactly ONE whitespace byte separates maxval from raster;
        # maxval > 255 ⇒ two-byte big-endian samples (pgm/ppm spec)
        width_b = 2 if mx > 255 else 1
        raster = data[pos + 1 : pos + 1 + n * width_b]
        if len(raster) != n * width_b:
            raise ValueError(
                f"netpbm raster holds {len(raster)} B != {n * width_b}"
            )
        if width_b == 2:
            vals = [
                (raster[2 * i] << 8) | raster[2 * i + 1] for i in range(n)
            ]
        else:
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
    maxval: int = 255,
    bitmap: bool = False,
) -> bytes:
    """Row-major 8-bit pixels → P5/P6 (binary) or P2/P3 (ASCII); with
    ``bitmap=True`` (pixels must be 0/255, channels 1) → P4/P1; with
    ``maxval=65535`` the binary raster stores ``v*257`` two-byte BE
    samples, the exact 16-bit widening of the 8-bit input."""
    if channels not in (1, 3):
        raise ValueError(f"netpbm supports 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    if bitmap:
        if channels != 1:
            raise ValueError("PBM is single-channel")
        if any(v not in (0, 255) for v in pixels):
            raise ValueError("PBM requires pure black/white (0/255) pixels")
        bits = [1 - (v // 255) for v in pixels]  # 1 = black per spec
        if ascii_variant:
            body = b"\n".join(
                b"".join(b"%d" % v for v in bits[y * width : (y + 1) * width])
                for y in range(height)
            )
            return b"P1\n%d %d\n" % (width, height) + body + b"\n"
        stride = (width + 7) // 8
        packed = bytearray(stride * height)
        for y in range(height):
            for x in range(width):
                if bits[y * width + x]:
                    packed[y * stride + (x >> 3)] |= 0x80 >> (x & 7)
        return b"P4\n%d %d\n" % (width, height) + bytes(packed)
    if maxval not in (255, 65535):
        raise ValueError("encoder writes maxval 255 or 65535 only")
    if ascii_variant:
        magic = b"P2" if channels == 1 else b"P3"
        scale = 257 if maxval == 65535 else 1
        body = b"\n".join(
            b" ".join(
                str(v * scale).encode()
                for v in pixels[i : i + width * channels]
            )
            for i in range(0, len(pixels), width * channels)
        )
        return magic + b"\n%d %d\n%d\n" % (width, height, maxval) + body + b"\n"
    magic = b"P5" if channels == 1 else b"P6"
    if maxval == 65535:
        raster = b"".join(bytes([v, v]) for v in pixels)  # v*257 = (v<<8)|v
        return magic + b"\n%d %d\n65535\n" % (width, height) + raster
    return magic + b"\n%d %d\n255\n" % (width, height) + pixels


def encode_pam(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    maxval: int = 255,
) -> bytes:
    """Row-major 8-bit pixels → P7/PAM (GRAYSCALE/RGB tuple types, with
    ALPHA at 2/4 channels — r13; binary raster; ``maxval=65535`` writes
    the exact v*257 widening)."""
    if channels not in (1, 2, 3, 4):
        raise ValueError(f"PAM encode supports 1-4 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    if maxval not in (255, 65535):
        raise ValueError("encoder writes maxval 255 or 65535 only")
    ttype = {
        1: b"GRAYSCALE", 2: b"GRAYSCALE_ALPHA", 3: b"RGB", 4: b"RGB_ALPHA",
    }[channels]
    hdr = (
        b"P7\n"
        + b"WIDTH %d\n" % width
        + b"HEIGHT %d\n" % height
        + b"DEPTH %d\n" % channels
        + b"MAXVAL %d\n" % maxval
        + b"TUPLTYPE " + ttype + b"\n"
        + b"ENDHDR\n"
    )
    if maxval == 65535:
        return hdr + b"".join(bytes([v, v]) for v in pixels)
    return hdr + pixels
