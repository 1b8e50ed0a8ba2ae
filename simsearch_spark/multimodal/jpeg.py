"""Dependency-free baseline JPEG codec (ITU-T T.81) — real entropy decode
for the multimodal surface using stdlib ``struct`` + numpy.

Scope: baseline sequential DCT (SOF0), 8-bit samples, grayscale or YCbCr,
chroma subsampling up to 2×2, restart markers, standard or custom
DQT/DHT tables.  Progressive (SOF2), arithmetic coding, and 12-bit
precision raise ``NotImplementedError``; malformed streams raise
``ValueError`` (same bounded-exception contract as png.py/wav.py/avi.py).

The encoder (4:4:4 or 4:2:0, Annex-K standard tables, quality-scaled) is
JPEG's lossy round trip — tests assert PSNR bounds and near-exactness on
constant blocks rather than byte equality.  IDCT/FDCT are exact matrix
transforms (numpy), so codec error is quantization error only.
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
    """(code_length, code) -> symbol, canonical order (T.81 C.2)."""
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
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                qt[tq] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                p += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq_ = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq_))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
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
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tables >> 4, tables & 0xF))
            return _decode_scan(
                data, pos + seg_len, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        pos += seg_len
    raise ValueError("JPEG without SOS scan")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame
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
                            px = _C.T @ blk.reshape(8, 8) @ _C + 128.0
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
            except _RestartMarker:
                raise ValueError("restart marker mid-MCU") from None
            mcu_count += 1
    # upsample to full size and color-convert
    out_planes = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        pix = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, pix.tobytes()
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
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


def _encode_block(bw, blk, qtab, dc_tab, ac_tab, pred):
    coef = _C @ (blk - 128.0) @ _C.T
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
) -> bytes:
    """Encode row-major 8-bit pixels (grayscale or RGB) as baseline JPEG
    with Annex-K tables; ``subsample=True`` emits 4:2:0 chroma;
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every N
    MCUs with DC-predictor resets (exercises the decoder's resync path —
    the quantized coefficients are unchanged, so decode output is
    bit-identical to the non-restart encoding)."""
    if channels not in (1, 3):
        raise ValueError(f"channels {channels}")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels).astype(np.float64)
    lq = _scale_q(STD_LUMA_Q, quality)
    cq = _scale_q(STD_CHROMA_Q, quality)
    if channels == 3:
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

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    # DQT bodies are stored in ZIGZAG order (T.81 B.2.4.1)
    out += seg(0xDB, bytes([0]) + bytes(lq[ZIGZAG].tolist()))
    if channels == 3:
        out += seg(0xDB, bytes([1]) + bytes(cq[ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, ch, cv, tq_, _p in comps:
        sof += bytes([cid, (ch << 4) | cv, tq_])
    out += seg(0xC0, sof)
    tables = [(0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA)]
    if channels == 3:
        tables += [(0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA)]
    for tid, (bits, vals) in tables:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    enc_dc = {0: _build_encode_table(*STD_DC_LUMA), 1: _build_encode_table(*STD_DC_CHROMA)}
    enc_ac = {0: _build_encode_table(*STD_AC_LUMA), 1: _build_encode_table(*STD_AC_CHROMA)}
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
