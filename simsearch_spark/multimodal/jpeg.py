"""Dependency-free baseline JPEG codec (ITU-T T.81) — real entropy decode
for the multimodal surface using stdlib ``struct`` + numpy.

Scope: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 — spectral
selection, successive approximation, EOB runs; r8), 8-bit samples,
grayscale, YCbCr, Adobe-marker RGB, and — r12 — 4-component CMYK/YCCK
(APP14 transform 0/2, Photoshop's inverted-value storage convention,
composited to RGB via the naive C'·K'/255 formula), chroma subsampling
up to 2×2, restart markers, standard or custom DQT/DHT tables, and —
r13 — 12-bit precision in SOF1/SOF2 frames (16-bit Pq=1 DQT, level
shift 2048, /16 reduction to the 8-bit output contract) with an
extended-sequential grayscale encoder dual (``encode_jpeg_12``).
Arithmetic coding and hierarchical frames raise ``NotImplementedError``;
malformed streams raise ``ValueError`` (same bounded-exception contract
as png.py/wav.py/avi.py).

The encoder (4:4:4 or 4:2:0, Annex-K standard tables, quality-scaled) is
JPEG's lossy round trip — tests assert PSNR bounds and near-exactness on
constant blocks rather than byte equality.  IDCT/FDCT are exact matrix
transforms (numpy), so codec error is quantization error only.  The
progressive encoder shares the baseline quantizer, which pins the decoder
contract exactly: progressive decode == baseline decode, bit for bit, on
any image (tests/test_jpeg.py property-tests this).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K — public spec tables)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# standard Huffman specs: (BITS[1..16], HUFFVAL)
STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# exact DCT-II basis (orthonormal): IDCT = C.T @ X @ C, FDCT = C @ x @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, canonical order (T.81 C.2).
    Memoized on the table spec: MJPEG streams re-declare the identical DHT
    in EVERY frame, and rebuilding it dominated small-frame decode
    (media_shot_boundaries decodes ~32k one-block frames per sf0.1 run).
    The returned dict is SHARED — all callers are read-only."""
    return _build_decode_table_cached(tuple(bits), tuple(vals))


from functools import lru_cache  # noqa: E402  (decoder-local helper)


@lru_cache(maxsize=256)
def _build_decode_table_cached(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> dict[tuple[int, int], int]:
    table: dict[tuple[int, int], int] = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[vi]
            vi += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code_length, code)."""
    return {sym: key for key, sym in _build_decode_table(bits, vals).items()}


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing and
    restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy stream truncated")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            m = d[self.pos]
            if m == 0x00:
                self.pos += 1
            elif 0xD0 <= m <= 0xD7:  # RSTn inside fill — caller handles resync
                raise _RestartMarker(m)
            else:
                # EOI or next segment reached while bits were still needed
                raise ValueError(f"unexpected marker 0xFF{m:02X} in entropy data")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self) -> None:
        """Drop partial bits and consume an RSTn marker at the byte cursor."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d) and not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("expected restart marker")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG → (width, height, channels, row-major 8-bit pixels);
    3-component images come back as RGB, 1-component as grayscale.
    Malformed streams raise ValueError only — low-level slice/struct/key
    errors from truncated or corrupt segments are normalized so the Spark
    stats operators' exception contract holds."""
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, struct.error, ZeroDivisionError) as e:
        raise ValueError(f"malformed JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (w, h, [(cid, h, v, tq)])
    restart_interval = 0
    progressive = False
    pstate: _ProgState | None = None
    adobe_transform = None  # APP14: None = no Adobe marker
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while data[pos + 1] == 0xFF:  # optional fill bytes (B.1.1.2)
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq == 0:
                    qt[tq] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                    p += 65
                elif pq == 1:
                    # 16-bit table entries (r13 — the 12-bit-precision norm)
                    qt[tq] = np.frombuffer(
                        seg[p + 1 : p + 129], dtype=">u2"
                    ).astype(np.int32)
                    p += 129
                else:
                    raise ValueError(f"DQT precision {pq}")
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec not in (8, 12):
                raise NotImplementedError(f"JPEG precision {prec}")
            if prec == 12 and marker == 0xC0:
                # T.81 table B.2: baseline is 8-bit by definition — a
                # 12-bit SOF0 is an inconsistent marker combination
                raise ValueError("12-bit precision in a baseline (SOF0) frame")
            comps = []
            for i in range(nc):
                cid, hv, tq_ = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq_))
            frame = (w, h, comps, prec)
            progressive = marker == 0xC2
            if progressive:
                pstate = _ProgState(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG frame 0xFF{marker:02X}")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            # APP14 Adobe: transform 0 = CMYK/RGB direct, 1 = YCbCr,
            # 2 = YCCK; its presence also flags Adobe's INVERTED CMYK
            # storage convention (r12)
            adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tables >> 4, tables & 0xF))
            if not progressive:
                return _decode_scan(
                    data, pos + seg_len, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval, adobe_transform,
                )
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos = _decode_progressive_scan(
                data, pos + seg_len, pstate, scan, huff_dc, huff_ac,
                ss, se, ahal >> 4, ahal & 0xF, restart_interval,
            )
            continue
        pos += seg_len
    if progressive and pstate is not None and pstate.any_scan:
        return pstate.reconstruct(qt, adobe_transform)
    raise ValueError("JPEG without SOS scan")


def _decode_scan(
    data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval,
    adobe_transform=None,
):
    w, h, comps, prec = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    scan_map = {cs: (td, ta) for cs, td, ta in scan}
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_restart()
                pred = {cid: 0 for cid, *_ in comps}
            try:
                for cid, ch, cv, tq_ in comps:
                    td, ta = scan_map[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            coef = _decode_block(reader, huff_dc[td], huff_ac[ta])
                            coef[0] += pred[cid]
                            pred[cid] = coef[0]
                            blk = np.zeros(64)
                            blk[ZIGZAG] = coef * qt[tq_]  # both zigzag-ordered
                            px = _C.T @ blk.reshape(8, 8) @ _C + (1 << (prec - 1))
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
            except _RestartMarker:
                raise ValueError("restart marker mid-MCU") from None
            mcu_count += 1
    return _assemble(comps, planes, w, h, hmax, vmax, adobe_transform, prec)


def _ycc_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return r, g, b


def _assemble(
    comps, planes, w, h, hmax, vmax, adobe_transform=None, prec=8
) -> tuple[int, int, int, bytes]:
    """Upsample component planes to full size and color-convert — shared by
    the baseline and progressive reconstruction paths.  ``adobe_transform``
    is the APP14 byte (None = no Adobe marker): 4-component images decode
    as CMYK (transform 0) or YCCK (2) to RGB via the naive CMYK
    composite; an Adobe marker flags Photoshop's inverted-CMYK storage
    (r12).  3-component transform 0 is stored RGB (no color transform).
    ``prec`` (r13): 12-bit samples reduce to the 8-bit contract by /16
    BEFORE color math — the level-shifted 12-bit center 2048 lands on
    128, so the 8-bit pipeline (and the v*16 widening convention's exact
    round trip) follows unchanged."""
    out_planes = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if prec != 8:
            p = p / float(1 << (prec - 8))
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        pix = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, pix.tobytes()
    if len(comps) == 4:
        if adobe_transform == 2:  # YCCK: YCbCr over the inverted CMY
            ci, mi, yi = _ycc_to_rgb(*out_planes[:3])
            ki = out_planes[3]
        elif adobe_transform in (None, 0):
            ci, mi, yi, ki = out_planes
            if adobe_transform is None:
                # no Adobe marker: plain (non-inverted) CMYK
                ci, mi, yi, ki = 255.0 - ci, 255.0 - mi, 255.0 - yi, 255.0 - ki
        else:
            raise NotImplementedError(
                f"4-component JPEG with Adobe transform {adobe_transform}"
            )
        # naive composite over the INVERTED values: R = C'·K'/255
        ci, mi, yi, ki = (np.clip(p, 0.0, 255.0) for p in (ci, mi, yi, ki))
        rgb = np.stack([ci * ki, mi * ki, yi * ki], axis=-1) / 255.0
        return w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8).tobytes()
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    if adobe_transform == 2:
        # YCCK is only meaningful for 4 components; a 3-component scan
        # claiming transform 2 is an inconsistent marker combination
        raise ValueError("3-component JPEG with Adobe transform 2 (YCCK)")
    if adobe_transform == 0:  # Adobe says: stored RGB, no transform
        rgb = np.stack(out_planes, axis=-1)
        return w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8).tobytes()
    r, g, b = _ycc_to_rgb(*out_planes)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8).tobytes()


def _decode_block(reader, dc_table, ac_table) -> np.ndarray:
    coef = np.zeros(64, dtype=np.int64)
    t = _decode_huff(reader, dc_table)
    if t > 15:  # legal DC categories are 0..11; a corrupt DHT can say 255
        raise ValueError(f"invalid DC category {t}")
    coef[0] = _extend(reader.read_bits(t), t) if t else 0
    k = 1
    while k < 64:
        rs = _decode_huff(reader, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        coef[k] = _extend(reader.read_bits(s), s)
        k += 1
    return coef


# ---------------------------------------------------------------------------
# progressive decoder (SOF2) — T.81 Annex G.2: coefficients accumulate
# across scans (spectral selection bands × successive-approximation bit
# planes) and are reconstructed once at EOI
# ---------------------------------------------------------------------------


class _ProgState:
    """Accumulated progressive-decode state: one zigzag-order coefficient
    row per block on the INTERLEAVED grid per component (DC scans cover the
    padded interleaved grid; single-component AC scans cover the smaller
    non-interleaved grid per A.2.2 — both index into the same store)."""

    def __init__(self, frame):
        w, h, comps, _prec = frame
        self.frame = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coef: dict[int, np.ndarray] = {}
        self.dims: dict[int, tuple[int, int, int, int]] = {}
        for cid, ch, cv, _tq in comps:
            bw_i, bh_i = self.mcux * ch, self.mcuy * cv
            nbw = (-(-(w * ch) // self.hmax) + 7) // 8
            nbh = (-(-(h * cv) // self.vmax) + 7) // 8
            self.dims[cid] = (bw_i, bh_i, nbw, nbh)
            self.coef[cid] = np.zeros((bh_i * bw_i, 64), dtype=np.int64)
        self.any_scan = False

    def reconstruct(self, qt, adobe_transform=None) -> tuple[int, int, int, bytes]:
        w, h, comps, prec = self.frame
        planes = {}
        for cid, ch, cv, tq_ in comps:
            bw_i, bh_i, _, _ = self.dims[cid]
            dq = self.coef[cid].astype(np.float64) * qt[tq_].astype(np.float64)[None, :]
            nat = np.zeros_like(dq)
            nat[:, ZIGZAG] = dq  # same zigzag placement as the baseline path
            px = _C.T[None] @ nat.reshape(-1, 8, 8) @ _C[None] + (1 << (prec - 1))
            planes[cid] = (
                px.reshape(bh_i, bw_i, 8, 8).transpose(0, 2, 1, 3).reshape(bh_i * 8, bw_i * 8)
            )
        return _assemble(
            comps, planes, w, h, self.hmax, self.vmax, adobe_transform, prec
        )


def _decode_progressive_scan(
    data, pos, st: _ProgState, scan, huff_dc, huff_ac, ss, se, ah, al, restart_interval
):
    """Decode ONE progressive scan's entropy data into the coefficient
    store; returns the byte offset of the next marker."""
    try:
        return _decode_progressive_scan_inner(
            data, pos, st, scan, huff_dc, huff_ac, ss, se, ah, al, restart_interval
        )
    except _RestartMarker:
        # a stray RSTn mid-entropy (malformed stream) must surface as the
        # bounded ValueError, not the private resync exception
        raise ValueError("unexpected restart marker in progressive scan") from None


def _decode_progressive_scan_inner(
    data, pos, st: _ProgState, scan, huff_dc, huff_ac, ss, se, ah, al, restart_interval
):
    _w, _h, comps, _prec = st.frame
    cmap = {cid: (ch, cv) for cid, ch, cv, _tq in comps}
    reader = _BitReader(data, pos)
    st.any_scan = True
    if ss == 0:  # ---- DC scan ----
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        pred = {cs: 0 for cs, _td, _ta in scan}
        count = 0

        def dc_block(blk, td):
            if ah == 0:
                t = _decode_huff(reader, huff_dc[td])
                if t > 15:
                    raise ValueError(f"invalid DC category {t}")
                diff = _extend(reader.read_bits(t), t) if t else 0
                return diff
            return None

        if len(scan) > 1:  # interleaved MCU order over the padded grid
            for my in range(st.mcuy):
                for mx in range(st.mcux):
                    if restart_interval and count and count % restart_interval == 0:
                        reader.align_to_restart()
                        pred = {cs: 0 for cs in pred}
                    count += 1
                    for cs, td, _ta in scan:
                        ch, cv = cmap[cs]
                        bw_i = st.dims[cs][0]
                        for by in range(cv):
                            for bx in range(ch):
                                blk = st.coef[cs][(my * cv + by) * bw_i + (mx * ch + bx)]
                                if ah == 0:
                                    pred[cs] += dc_block(blk, td)
                                    blk[0] = pred[cs] << al
                                elif reader.read_bit():
                                    blk[0] |= 1 << al
        else:  # single-component: non-interleaved block raster
            cs, td, _ta = scan[0]
            bw_i, _bh_i, nbw, nbh = st.dims[cs]
            for by in range(nbh):
                for bx in range(nbw):
                    if restart_interval and count and count % restart_interval == 0:
                        reader.align_to_restart()
                        pred = {cs: 0 for cs in pred}
                    count += 1
                    blk = st.coef[cs][by * bw_i + bx]
                    if ah == 0:
                        pred[cs] += dc_block(blk, td)
                        blk[0] = pred[cs] << al
                    elif reader.read_bit():
                        blk[0] |= 1 << al
    else:  # ---- AC scan: single component only (G.1.1.1.1) ----
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cs, _td, ta = scan[0]
        bw_i, _bh_i, nbw, nbh = st.dims[cs]
        coef = st.coef[cs]
        table = huff_ac[ta]
        eobrun = 0
        count = 0
        for by in range(nbh):
            for bx in range(nbw):
                if restart_interval and count and count % restart_interval == 0:
                    reader.align_to_restart()
                    eobrun = 0
                count += 1
                blk = coef[by * bw_i + bx]
                if ah == 0:
                    eobrun = _ac_first_block(reader, table, blk, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(reader, table, blk, ss, se, al, eobrun)
    # advance to the next marker (skip residual entropy padding)
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    return len(data)


def _ac_first_block(reader, table, blk, ss, se, al, eobrun) -> int:
    """G.2.2: first pass of an AC band — magnitudes arrive shifted left by
    Al; EOBn symbols start runs of all-remaining-zero bands."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(reader, table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, table, blk, ss, se, al, eobrun) -> int:
    """G.2.3: successive-approximation refinement of an AC band — newly
    significant coefficients arrive as ±1<<Al; every already-nonzero
    coefficient crossed (including inside ZRL runs and EOB runs) receives
    one correction bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(reader, table)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break  # tail of this block handled by the eobrun branch
                # r == 15: ZRL — skip 16 ZERO-HISTORY positions
            else:
                if s != 1:
                    raise ValueError("refinement scan with magnitude > 1")
                newval = p1 if reader.read_bit() else -p1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if reader.read_bit() and (abs(c) & p1) == 0:
                        blk[k] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if reader.read_bit() and (abs(c) & p1) == 0:
                    blk[k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _scale_q(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int32)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _prep_comps(width, height, channels, pixels, quality, subsample,
                cmyk_transform=0):
    """Shared encoder front half: color-convert, optionally subsample, and
    MCU-pad the component planes.  Returns (comps [(cid, h, v, tq, plane)],
    luma_q, chroma_q, hmax, vmax, mcux, mcuy, padded{cid: plane}).
    channels==4 (r12) takes Adobe-convention INVERTED CMYK and emits the
    4-component layout for ``cmyk_transform`` 0 (direct) or 2 (YCCK —
    YCbCr over the inverted CMY, K passthrough), never subsampled."""
    if channels not in (1, 3, 4):
        raise ValueError(f"channels {channels}")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels).astype(np.float64)
    lq = _scale_q(STD_LUMA_Q, quality)
    cq = _scale_q(STD_CHROMA_Q, quality)
    if channels == 4:
        if subsample:
            raise ValueError("CMYK JPEG encode is 4:4:4 only")
        ci, mi, yi, ki = (arr[..., i] for i in range(4))
        if cmyk_transform == 2:
            y = 0.299 * ci + 0.587 * mi + 0.114 * yi
            cb = 128.0 - 0.168736 * ci - 0.331264 * mi + 0.5 * yi
            cr = 128.0 + 0.5 * ci - 0.418688 * mi - 0.081312 * yi
            comps = [(1, 1, 1, 0, y), (2, 1, 1, 1, cb), (3, 1, 1, 1, cr),
                     (4, 1, 1, 0, ki)]
        elif cmyk_transform == 0:
            comps = [(1, 1, 1, 0, ci), (2, 1, 1, 0, mi), (3, 1, 1, 0, yi),
                     (4, 1, 1, 0, ki)]
        else:
            raise ValueError(f"CMYK transform {cmyk_transform} (0/2 only)")
    elif channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            pad_h, pad_w = (height + 1) // 2 * 2, (width + 1) // 2 * 2
            cbp = np.pad(cb, ((0, pad_h - height), (0, pad_w - width)), mode="edge")
            crp = np.pad(cr, ((0, pad_h - height), (0, pad_w - width)), mode="edge")
            cb = (cbp[0::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0
            comps = [(1, 2, 2, 0, y), (2, 1, 1, 1, cb), (3, 1, 1, 1, cr)]
        else:
            comps = [(1, 1, 1, 0, y), (2, 1, 1, 1, cb), (3, 1, 1, 1, cr)]
    else:
        comps = [(1, 1, 1, 0, arr[..., 0])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    padded = {}
    for cid, ch, cv, _tq, plane in comps:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        padded[cid] = np.pad(
            plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge"
        )
    return comps, lq, cq, hmax, vmax, mcux, mcuy, padded


def _encode_block(bw, blk, qtab, dc_tab, ac_tab, pred, level=128.0):
    coef = _C @ (blk - level) @ _C.T
    q = np.rint(coef.reshape(-1)[ZIGZAG] / qtab).astype(np.int64)
    diff = int(q[0]) - pred
    mag, t = abs(diff), 0
    while mag:
        mag >>= 1
        t += 1
    ln, code = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q[1:]) else 0
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                ln, code = ac_tab[0xF0]
                bw.write(code, ln)
                run = 0
            continue
        mag, s = abs(v), 0
        while mag:
            mag >>= 1
            s += 1
        ln, code = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(q[0])


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    cmyk_transform: int = 0,
) -> bytes:
    """Encode row-major 8-bit pixels (grayscale, RGB, or — r12 —
    Adobe-convention inverted CMYK for channels==4) as baseline JPEG
    with Annex-K tables; ``subsample=True`` emits 4:2:0 chroma;
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every N
    MCUs with DC-predictor resets (exercises the decoder's resync path —
    the quantized coefficients are unchanged, so decode output is
    bit-identical to the non-restart encoding).  channels==4 writes the
    APP14 Adobe marker with ``cmyk_transform`` (0 direct / 2 YCCK)."""
    comps, lq, cq, hmax, vmax, mcux, mcuy, padded = _prep_comps(
        width, height, channels, pixels, quality, subsample, cmyk_transform
    )

    def seg(marker: int, body: bytes) -> bytes:
        return _seg(marker, body)

    any_chroma = any(c[3] == 1 for c in comps)
    out = bytearray(b"\xff\xd8")
    if channels == 4:
        # APP14 Adobe: version 100, flags 0, the transform byte
        out += seg(
            0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, cmyk_transform)
        )
    # DQT bodies are stored in ZIGZAG order (T.81 B.2.4.1)
    out += seg(0xDB, bytes([0]) + bytes(lq[ZIGZAG].tolist()))
    if any_chroma:
        out += seg(0xDB, bytes([1]) + bytes(cq[ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, ch, cv, tq_, _p in comps:
        sof += bytes([cid, (ch << 4) | cv, tq_])
    out += seg(0xC0, sof)
    tables = [(0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA)]
    if any_chroma:
        tables += [(0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA)]
    for tid, (bits, vals) in tables:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _ch, _cv, tq_, _p in comps:
        sos += bytes([cid, 0x00 if tq_ == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    enc_dc = {0: _build_encode_table(*STD_DC_LUMA), 1: _build_encode_table(*STD_DC_CHROMA)}
    enc_ac = {0: _build_encode_table(*STD_AC_LUMA), 1: _build_encode_table(*STD_AC_CHROMA)}
    bw = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = {cid: 0 for cid, *_ in comps}
            mcu_count += 1
            for cid, ch, cv, tq_, _plane in comps:
                # zigzag-ordered table: _encode_block divides zigzag-ordered
                # coefficients (matches the zigzag-ordered DQT the decoder
                # multiplies by)
                qz = (lq if tq_ == 0 else cq)[ZIGZAG]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        blk = padded[cid][y0 : y0 + 8, x0 : x0 + 8]
                        pred[cid] = _encode_block(
                            bw, blk, qz, enc_dc[0 if tq_ == 0 else 1],
                            enc_ac[0 if tq_ == 0 else 1], pred[cid],
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


#: flat canonical Huffman specs for the 12-bit encoder: every symbol one
#: fixed short length (DC: 16 categories at 5 bits, Kraft 0.5; AC: all
#: 256 run/size bytes split 128 at 8 bits + 128 at 9 — DHT's per-length
#: counts are single BYTES, so one length cannot hold all 256; Kraft
#: 128/256 + 128/512 = 0.75) — valid tables the generic DHT reader
#: decodes, sized for the categories 12-bit samples can reach (the
#: Annex-K tables stop at DC category 11 / AC size 10)
_DEEP_DC_SPEC = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                 list(range(16)))
_DEEP_AC_SPEC = ([0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0],
                 list(range(256)))


def encode_jpeg_12(
    width: int, height: int, samples, quality: int = 85
) -> bytes:
    """Grayscale 12-bit EXTENDED-SEQUENTIAL (SOF1) encoder — the r13
    dual of the 12-bit decode path.  ``samples``: 0..4095 ints, row
    major.  Writes a Pq=1 (16-bit) DQT holding the Annex-K luma table
    ×16 — the same relative quantization as the 8-bit encoder, so
    values on the v*16 widened level set round-trip with exactly the
    8-bit path's error behavior (block-constant images decode exactly) —
    and the flat `_DEEP_*` Huffman tables whose categories cover the
    12-bit coefficient range."""
    vals = list(samples)
    if len(vals) != width * height:
        raise ValueError(f"sample buffer {len(vals)} != {width}x{height}")
    if any(not 0 <= int(v) <= 4095 for v in vals):
        raise ValueError("12-bit samples must lie in 0..4095")
    arr = np.array(vals, dtype=np.float64).reshape(height, width)
    lq = np.clip(
        _scale_q(STD_LUMA_Q, quality).astype(np.int64) * 16, 1, 65535
    ).astype(np.int32)
    mcux, mcuy = (width + 7) // 8, (height + 7) // 8
    padded = np.pad(
        arr, ((0, mcuy * 8 - height), (0, mcux * 8 - width)), mode="edge"
    )
    dc_tab = _build_encode_table(*_DEEP_DC_SPEC)
    ac_tab = _build_encode_table(*_DEEP_AC_SPEC)
    out = bytearray(b"\xff\xd8")
    qz = lq[ZIGZAG]
    out += _seg(
        0xDB,
        bytes([0x10]) + b"".join(struct.pack(">H", int(v)) for v in qz),
    )
    out += _seg(
        0xC1, bytes([12]) + struct.pack(">HH", height, width) + bytes([1, 1, 0x11, 0])
    )
    for tc, (bits, vals_t) in ((0, _DEEP_DC_SPEC), (1, _DEEP_AC_SPEC)):
        out += _seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals_t))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    pred = 0
    for my in range(mcuy):
        for mx in range(mcux):
            blk = padded[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            pred = _encode_block(bw, blk, qz, dc_tab, ac_tab, pred, level=2048.0)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2) — spectral selection + successive approximation
# with EOB runs, the libjpeg-style default scan script.  Exists to exercise
# the progressive DECODER against ground truth: both paths quantize
# identically, so progressive decode must reproduce the baseline decode of
# the same image bit-for-bit.
# ---------------------------------------------------------------------------


class _ScanSink:
    """Two-pass scan emission: pass 1 (no writer) collects the Huffman
    symbols a scan uses so a table covering exactly those symbols can be
    built; pass 2 writes codes and raw bits."""

    def __init__(self, bw: _BitWriter | None = None, table: dict | None = None):
        self.bw, self.table = bw, table
        self.syms: set[int] = set()

    def sym(self, s: int) -> None:
        if self.bw is None:
            self.syms.add(s)
        else:
            ln, code = self.table[s]
            self.bw.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if self.bw is not None and n:
            self.bw.write(v, n)

    def restart(self, m: int) -> None:
        """Byte-align and emit RSTm (pass 2 only); callers must flush any
        pending EOB run / correction bits FIRST — runs never cross a
        restart boundary (T.81 G.1.2.2)."""
        if self.bw is not None:
            self.bw.flush()
            self.bw.out += bytes([0xFF, 0xD0 + (m & 7)])


def _fixed_table(syms: set[int]) -> tuple[list[int], list[int]]:
    """Canonical Huffman table assigning every used symbol one fixed code
    length L = bit_length(n) — valid (n < 2^L keeps the all-ones code
    unused, T.81 C.2) and trivially decodable; compression is irrelevant
    for the round-trip contract this encoder serves."""
    vals = sorted(syms)
    n = len(vals)
    ln = max(n.bit_length(), 1)
    bits = [0] * 16
    bits[ln - 1] = n
    return bits, vals


def _quantize_grid(padded: np.ndarray, qz: np.ndarray) -> np.ndarray:
    """Forward DCT + quantization over a padded plane, vectorized; returns
    (n_blocks, 64) zigzag-order int coefficients in interleaved block
    raster order — the same arithmetic as the baseline `_encode_block`."""
    ph, pw = padded.shape
    bh, bwid = ph // 8, pw // 8
    blocks = padded.reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = _C[None] @ (blocks - 128.0) @ _C.T[None]
    return np.rint(coef.reshape(-1, 64)[:, ZIGZAG] / qz[None, :]).astype(np.int64)


def _enc_dc_first(sink: _ScanSink, mcus, al: int, ri: int = 0) -> None:
    pred: dict[int, int] = {}
    rst = 0
    for mi, mcu in enumerate(mcus):
        if ri and mi and mi % ri == 0:
            sink.restart(rst)
            rst = (rst + 1) & 7
            pred = {}
        for cs, blk in mcu:
            v = int(blk[0]) >> al  # arithmetic shift: floor toward -inf, G.1.2.1
            diff = v - pred.get(cs, 0)
            pred[cs] = v
            t = abs(diff).bit_length()
            sink.sym(t)
            if t:
                sink.bits(diff if diff > 0 else diff + (1 << t) - 1, t)


def _enc_dc_refine(sink: _ScanSink, mcus, al: int, ri: int = 0) -> None:
    rst = 0
    for mi, mcu in enumerate(mcus):
        if ri and mi and mi % ri == 0:
            sink.restart(rst)
            rst = (rst + 1) & 7
        for _cs, blk in mcu:
            sink.bits((int(blk[0]) >> al) & 1, 1)


def _enc_ac_first(sink: _ScanSink, blocks, ss: int, se: int, al: int, ri: int = 0) -> None:
    eobrun = 0
    rst = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            sink.sym(n << 4)
            if n:
                sink.bits(eobrun - (1 << n), n)
            eobrun = 0

    for bi, blk in enumerate(blocks):
        if ri and bi and bi % ri == 0:
            flush()  # an EOB run never crosses a restart (G.1.2.2)
            sink.restart(rst)
            rst = (rst + 1) & 7
        band = [int(v) for v in blk[ss : se + 1]]
        t = [(abs(v) >> al) * (1 if v >= 0 else -1) for v in band]
        nz = [i for i, v in enumerate(t) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run, last = 0, nz[-1]
        for i in range(last + 1):
            v = t[i]
            if v == 0:
                run += 1
                if run == 16:
                    sink.sym(0xF0)  # ZRL (a nonzero at `last` still follows)
                    run = 0
                continue
            s = abs(v).bit_length()
            sink.sym((run << 4) | s)
            sink.bits(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < len(band) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(sink: _ScanSink, blocks, ss: int, se: int, al: int, ri: int = 0) -> None:
    """G.1.2.3 correction-bit emission: runs count ZERO-HISTORY positions;
    already-nonzero coefficients contribute one buffered bit each, dumped
    after the next emitted symbol (ZRL / significance / EOBn) — exactly the
    order the refinement decoder consumes them in."""
    eobrun = 0
    rst = 0
    bits_pend: list[int] = []  # correction bits deferred with the EOB run

    def flush() -> None:
        nonlocal eobrun, bits_pend
        if eobrun:
            n = eobrun.bit_length() - 1
            sink.sym(n << 4)
            if n:
                sink.bits(eobrun - (1 << n), n)
            eobrun = 0
        for b in bits_pend:
            sink.bits(b, 1)
        bits_pend = []

    for bi, blk in enumerate(blocks):
        if ri and bi and bi % ri == 0:
            flush()  # pending EOB run + correction bits stay inside the interval
            sink.restart(rst)
            rst = (rst + 1) & 7
        band = [int(v) for v in blk[ss : se + 1]]
        absv = [abs(v) >> al for v in band]
        eobpos = -1
        for i, a in enumerate(absv):
            if a == 1:
                eobpos = i
        run = 0
        br: list[int] = []
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            # ZRL check runs at EVERY nonzero (history or new) so the
            # buffered bits stay aligned with the decoder's crossings
            while run > 15 and i <= eobpos:
                flush()
                sink.sym(0xF0)
                run -= 16
                for b in br:
                    sink.bits(b, 1)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            flush()
            sink.sym((run << 4) | 1)
            sink.bits(1 if band[i] > 0 else 0, 1)
            for b in br:
                sink.bits(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            bits_pend.extend(br)
            if eobrun == 0x7FFF or len(bits_pend) > 900:
                flush()
    flush()


def encode_jpeg_progressive(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode row-major 8-bit pixels as PROGRESSIVE JPEG (SOF2) using the
    libjpeg-shaped default script — interleaved DC first at Al=1, per-
    component AC bands 1-5 / 6-63 at Al=2, two AC refinement passes, DC
    refinement last.  Quantization is shared with the baseline encoder, so
    ``decode_jpeg(encode_jpeg_progressive(px)) ==
    decode_jpeg(encode_jpeg(px))`` bit-for-bit — the round-trip contract
    the progressive decoder is tested against.  Each scan carries its own
    DHT built over exactly the symbols it emits (EOBn symbols are not in
    the Annex-K baseline tables).  ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every N MCUs (DC scans) / N blocks (AC scans)
    with predictor and EOB-run resets — the quantized coefficients are
    unchanged, so decode output stays bit-identical to the non-restart
    encoding while exercising the decoder's progressive resync path."""
    if channels == 4:
        raise ValueError("progressive CMYK encode not supported")
    comps, lq, cq, hmax, vmax, mcux, mcuy, padded = _prep_comps(
        width, height, channels, pixels, quality, subsample
    )
    qzs = {0: lq[ZIGZAG].astype(np.float64), 1: cq[ZIGZAG].astype(np.float64)}
    grids: dict[int, np.ndarray] = {}
    dims: dict[int, tuple[int, int, int, int]] = {}
    for cid, ch, cv, tq_, _plane in comps:
        grids[cid] = _quantize_grid(padded[cid], qzs[tq_])
        nbw = (-(-(width * ch) // hmax) + 7) // 8
        nbh = (-(-(height * cv) // vmax) + 7) // 8
        dims[cid] = (mcux * ch, mcuy * cv, nbw, nbh)
    dc_mcus = []
    for my in range(mcuy):
        for mx in range(mcux):
            mcu = []
            for cid, ch, cv, _tq, _plane in comps:
                bw_i = dims[cid][0]
                for by in range(cv):
                    for bx in range(ch):
                        mcu.append((cid, grids[cid][(my * cv + by) * bw_i + (mx * ch + bx)]))
            dc_mcus.append(mcu)

    def ac_blocks(cid):
        bw_i, _bh, nbw, nbh = dims[cid]
        return [grids[cid][by * bw_i + bx] for by in range(nbh) for bx in range(nbw)]

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(lq[ZIGZAG].tolist()))
    if channels == 3:
        out += _seg(0xDB, bytes([1]) + bytes(cq[ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, ch, cv, tq_, _plane in comps:
        sof += bytes([cid, (ch << 4) | cv, tq_])
    out += _seg(0xC2, sof)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    cids = [c[0] for c in comps]
    script: list[tuple[str, int | None, int, int, int, int]] = [("dc1", None, 0, 0, 0, 1)]
    for cid in cids:
        script += [("ac1", cid, 1, 5, 0, 2), ("ac1", cid, 6, 63, 0, 2)]
    for cid in cids:
        script.append(("acr", cid, 1, 63, 2, 1))
    for cid in cids:
        script.append(("acr", cid, 1, 63, 1, 0))
    script.append(("dcr", None, 0, 0, 1, 0))

    for kind, cid, ss, se, ah, al in script:
        def run(sink: _ScanSink) -> None:
            if kind == "dc1":
                _enc_dc_first(sink, dc_mcus, al, restart_interval)
            elif kind == "dcr":
                _enc_dc_refine(sink, dc_mcus, al, restart_interval)
            elif kind == "ac1":
                _enc_ac_first(sink, ac_blocks(cid), ss, se, al, restart_interval)
            else:
                _enc_ac_refine(sink, ac_blocks(cid), ss, se, al, restart_interval)

        counter = _ScanSink()
        run(counter)
        if counter.syms:
            bits, vals = _fixed_table(counter.syms)
            tc = 0 if kind.startswith("dc") else 1
            out += _seg(0xC4, bytes([(tc << 4) | 0]) + bytes(bits) + bytes(vals))
            table = _build_encode_table(bits, vals)
        else:
            table = {}
        if kind.startswith("dc"):
            sos = bytes([len(comps)])
            for c in cids:
                sos += bytes([c, 0x00])
        else:
            sos = bytes([1, cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        bw = _BitWriter()
        run(_ScanSink(bw, table))
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
