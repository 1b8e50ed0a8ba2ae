"""Dependency-free FLAC codec — real compressed-audio decode for the
multimodal surface using only stdlib bit twiddling.

Built from the PUBLIC specification (RFC 9639 / xiph.org FLAC format):

- container: "fLaC" magic + metadata blocks (STREAMINFO parsed, others
  skipped) + frames.
- frame header: 14-bit sync, blocking strategy, coded block size / sample
  rate / channel assignment / sample size, UTF-8-style coded frame or
  sample number, optional explicit block size / rate fields, CRC-8.
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32, each
  with the wasted-bits-per-sample unary prefix.
- residuals: Rice method 0 (4-bit params) and 1 (RICE2, 5-bit params),
  2^order partitions, escape code → raw n-bit residuals.
- stereo decorrelation: left/side, right/side, mid/side (side channel
  carries +1 bit depth).
- integrity: CRC-8 over each frame header, CRC-16 over each whole frame —
  verified, a mismatch raises ValueError (bounded-failure contract like
  multimodal/wav.py).

The encoder exists to make the decoder honestly testable (round-trip
property tests over random PCM, every subframe type and stereo mode) and
to let fixtures route compressed audio through the REAL path: it emits
fixed-blocking streams choosing CONSTANT / FIXED(0-2) per block by
exhaustive cost, single-partition Rice, optional mid/side.  Lossless by
construction — decode(encode(pcm)) == pcm exactly, which is what lets the
closed-form audio oracles (queries/media.py) stay unchanged when fixtures
switch codecs.

Sample sizes (r12): every legal coded size — 8/12/16/20/24/32 — decodes;
the result reduces to the engine's int16 contract the way decode_wav's
PCM widths do (wider sizes keep their top 16 bits, narrower widen), and
the encoder can write any of them (exact on the representable level
set).  The remaining scope seam is reserved/rare stream features, which
surface as ValueError per the bounded-failure contract.
"""

from __future__ import annotations

import struct

__all__ = ["decode_flac", "encode_flac"]


# ---------------------------------------------------------------------------
# bit IO (FLAC packs MSB-first)
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits  # absolute bit position

    def read(self, n: int) -> int:
        d, p = self.data, self.pos
        end = p + n
        if end > len(d) * 8:
            raise ValueError("FLAC bitstream truncated")
        if n == 0:
            return 0
        # byte-chunked big-endian extract (the per-bit loop dominated the
        # audio queries' runtime — decode is in the Arrow batch hot path)
        first = p >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(d[first:last], "big")
        shift = (last - first) * 8 - (p - (first << 3)) - n
        self.pos = end
        return (chunk >> shift) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        """count of 0 bits before the next 1 bit (FLAC unary)."""
        d, p = self.data, self.pos
        total = len(d) * 8
        start = p
        # finish the current partial byte, then skip whole zero bytes
        while p < total:
            byte = d[p >> 3]
            rem = byte & ((1 << (8 - (p & 7))) - 1)  # bits at/after p
            if rem == 0:
                p = (p >> 3 << 3) + 8  # rest of byte is zeros
                while p + 8 <= total and d[p >> 3] == 0:
                    p += 8
                continue
            # highest set bit within the remainder
            p = (p >> 3 << 3) + (8 - rem.bit_length())
            self.pos = p + 1
            return p - start
        raise ValueError("FLAC bitstream truncated in unary")

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align_byte(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# CRCs (spec polynomials)
# ---------------------------------------------------------------------------

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# UTF-8-style coded numbers (frame/sample index; up to 36 bits)
# ---------------------------------------------------------------------------

def _write_utf8_num(w: _BitWriter, val: int) -> None:
    if val < 0x80:
        w.write(val, 8)
        return
    # count continuation bytes needed
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if val < (1 << bits):
            break
    cont = nbytes - 1
    # leading byte: cont+1 ones, a zero, then the high payload bits
    w.write((0xFF << (7 - cont)) & 0xFF | (val >> (6 * cont)), 8)
    for i in range(cont - 1, -1, -1):
        w.write(0b10 << 6 | ((val >> (6 * i)) & 0x3F), 8)


def _read_utf8_num(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    cont = 0
    mask = 0x40
    while b0 & mask:
        cont += 1
        mask >>= 1
    if cont < 1 or cont > 6:
        raise ValueError("invalid FLAC UTF-8-coded number")
    val = b0 & (mask - 1)
    for _ in range(cont):
        b = r.read(8)
        if b >> 6 != 0b10:
            raise ValueError("invalid FLAC UTF-8 continuation byte")
        val = (val << 6) | (b & 0x3F)
    return val


_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

#: frame-header sample-size codes (RFC 9639 §9.1.3); 0 = from STREAMINFO
_SS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_flac(payload: bytes) -> tuple[int, int, list[int]]:
    """FLAC bytes → (sample_rate, channels, interleaved int samples) — the
    same return contract as ``decode_wav``, any legal sample size
    reduced to int16 (r12).  Raises ``ValueError`` on malformed/corrupt
    streams (incl. CRC mismatches)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    rate = channels = bps = None
    total_samples = None
    # metadata blocks
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC truncated in metadata")
        hdr = payload[pos]
        last = hdr >> 7
        btype = hdr & 0x7F
        ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if btype == 0:  # STREAMINFO
            if ln != 34:
                raise ValueError(f"STREAMINFO length {ln} != 34")
            r = _BitReader(body)
            r.read(16)  # min blocksize
            r.read(16)  # max blocksize
            r.read(24)  # min framesize
            r.read(24)  # max framesize
            rate = r.read(20)
            channels = r.read(3) + 1
            bps = r.read(5) + 1
            total_samples = r.read(36)
        if last:
            break
    if rate is None or not rate or channels is None:
        raise ValueError("FLAC without valid STREAMINFO")
    if bps not in _SS_CODES:
        raise NotImplementedError(
            f"FLAC sample size {bps} (8/12/16/20/24/32 only)"
        )

    out: list[list[int]] = [[] for _ in range(channels)]
    r = _BitReader(payload, pos * 8)
    total_bits = len(payload) * 8
    while r.pos + 16 <= total_bits:
        frame_start_byte = r.pos >> 3
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_num(r)
        if bs_code == 0:
            raise ValueError("reserved block size code 0")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code 15")
        # sample size code must agree with STREAMINFO for our contract
        if ss_code not in (0, _SS_CODES[bps]):
            raise NotImplementedError("FLAC frame sample size != STREAMINFO")
        hdr_end = r.pos >> 3
        if r.pos & 7:
            raise ValueError("unaligned FLAC frame header")
        expect_crc8 = r.read(8)
        if _crc8(payload[frame_start_byte:hdr_end]) != expect_crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            nch = ch_code + 1
            side = None
        elif ch_code in (8, 9, 10):
            nch = 2
            side = ch_code
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if nch != channels:
            raise ValueError("frame channel count != STREAMINFO")

        chans: list[list[int]] = []
        for ci in range(nch):
            cbps = bps
            # the side channel carries one extra bit
            if side == 8 and ci == 1:
                cbps += 1
            elif side == 9 and ci == 0:
                cbps += 1
            elif side == 10 and ci == 1:
                cbps += 1
            chans.append(_read_subframe(r, blocksize, cbps))

        r.align_byte()
        frame_body_end = r.pos >> 3
        expect_crc16 = r.read(16)
        if _crc16(payload[frame_start_byte:frame_body_end]) != expect_crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")

        # undo stereo decorrelation
        if side == 8:  # left/side: right = left - side
            left, s = chans
            chans = [left, [l_ - s_ for l_, s_ in zip(left, s)]]
        elif side == 9:  # right/side: left = right + side
            s, right = chans
            chans = [[r_ + s_ for r_, s_ in zip(right, s)], right]
        elif side == 10:  # mid/side
            mid, s = chans
            lft, rgt = [], []
            for m, sd in zip(mid, s):
                m = (m << 1) | (sd & 1)
                lft.append((m + sd) >> 1)
                rgt.append((m - sd) >> 1)
            chans = [lft, rgt]
        for ci in range(channels):
            out[ci].extend(chans[ci])
        if total_samples and len(out[0]) >= total_samples:
            break

    if total_samples:
        out = [c[:total_samples] for c in out]
    interleaved: list[int] = []
    for i in range(len(out[0])):
        for c in range(channels):
            interleaved.append(out[c][i])
    # reduce to the engine's int16 contract (r12): wider depths keep
    # their top 16 bits, narrower depths widen into them — the WAV-PCM
    # convention, exact on the encoder's representable level set
    if bps > 16:
        interleaved = [s >> (bps - 16) for s in interleaved]
    elif bps < 16:
        interleaved = [s << (16 - bps) for s in interleaved]
    return rate, channels, interleaved


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        v = _sign_extend(r.read(eff), eff)
        samples = [v] * blocksize
    elif t == 1:  # VERBATIM
        samples = [_sign_extend(r.read(eff), eff) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = [_sign_extend(r.read(eff), eff) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        samples = list(warm)
        coeffs = _FIXED_COEFFS[order]
        for i in range(order, blocksize):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
            samples.append(resid[i - order] + pred)
    elif t >= 32:  # LPC
        order = t - 31
        warm = [_sign_extend(r.read(eff), eff) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        qlp = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        samples = list(warm)
        for i in range(order, blocksize):
            acc = sum(c * samples[i - 1 - j] for j, c in enumerate(qlp))
            samples.append(resid[i - order] + (acc >> shift))
    else:
        raise ValueError(f"reserved subframe type {t}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _sign_extend(v: int, n: int) -> int:
    return v - (1 << n) if v >> (n - 1) else v


def _read_residual(r: _BitReader, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("partition order does not divide block size")
    out: list[int] = []
    for pi in range(nparts):
        count = blocksize // nparts - (order if pi == 0 else 0)
        if count < 0:
            raise ValueError("predictor order exceeds first partition")
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            if raw == 0:
                out.extend([0] * count)
            else:
                out.extend(_sign_extend(r.read(raw), raw) for _ in range(count))
        else:
            for _ in range(count):
                q = r.read_unary()
                u = (q << k) | (r.read(k) if k else 0)
                out.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return out


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_flac(
    samples: list[int],
    sample_rate: int,
    channels: int = 1,
    block_size: int = 4096,
    mid_side: bool = False,
    force_verbatim: bool = False,
    bits_per_sample: int = 16,
) -> bytes:
    """Interleaved int16 samples → FLAC bytes (fixed blocking).  Per block
    and channel the cheapest of CONSTANT / FIXED order 0-2 is chosen by
    exact Rice cost (or VERBATIM when forced — decoder-coverage knob);
    ``mid_side=True`` emits mid/side stereo decorrelation.
    ``bits_per_sample`` (r12): >16 widens each int16 into the top bits
    (always exact); <16 narrows — exact only on inputs divisible by
    ``2^(16-bps)``, which is enforced.  Lossless on that set:
    ``decode_flac(encode_flac(x)) == x`` (property-tested)."""
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if mid_side and channels != 2:
        raise ValueError("mid_side requires exactly 2 channels")
    bps = bits_per_sample
    if bps not in _SS_CODES:
        raise ValueError(f"FLAC encode sample size {bps}")
    if bps > 16:
        samples = [int(s) << (bps - 16) for s in samples]
    elif bps < 16:
        step = 1 << (16 - bps)
        if any(int(s) % step for s in samples):
            raise ValueError(
                f"{bps}-bit FLAC encode requires multiples of {step}"
            )
        samples = [int(s) >> (16 - bps) for s in samples]
    n_frames = len(samples) // channels
    chans = [samples[c::channels] for c in range(channels)]

    w = _BitWriter()
    # STREAMINFO (md5 zeroed — readers treat it as 'unknown', per spec)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_frames, 36)
    for _ in range(16):
        si.write(0, 8)
    body = si.bytes()
    out = bytearray(b"fLaC")
    out.append(0x80)  # last block, STREAMINFO
    out += len(body).to_bytes(3, "big")
    out += body

    frame_no = 0
    for start in range(0, n_frames, block_size):
        bs = min(block_size, n_frames - start)
        fw = _BitWriter()
        fw.write(0b11111111111110, 14)
        fw.write(0, 1)
        fw.write(0, 1)  # fixed blocking
        fw.write(7, 4)  # 16-bit explicit block size follows
        fw.write(0, 4)  # sample rate from STREAMINFO
        ch_code = 10 if mid_side else channels - 1
        fw.write(ch_code, 4)
        fw.write(_SS_CODES[bps], 3)
        fw.write(0, 1)
        _write_utf8_num(fw, frame_no)
        fw.write(bs - 1, 16)
        hdr = fw
        hdr.align_byte()
        hdr_bytes = hdr.bytes()
        fb = _BitWriter()
        for b in hdr_bytes:
            fb.write(b, 8)
        fb.write(_crc8(hdr_bytes), 8)

        if mid_side:
            lft = chans[0][start : start + bs]
            rgt = chans[1][start : start + bs]
            mid = [(l_ + r_) >> 1 for l_, r_ in zip(lft, rgt)]
            sd = [l_ - r_ for l_, r_ in zip(lft, rgt)]
            _write_subframe(fb, mid, bps, force_verbatim)
            _write_subframe(fb, sd, bps + 1, force_verbatim)
        else:
            for c in range(channels):
                _write_subframe(fb, chans[c][start : start + bs], bps, force_verbatim)
        fb.align_byte()
        frame_bytes = fb.bytes()
        out += frame_bytes
        out += struct.pack(">H", _crc16(frame_bytes))
        frame_no += 1
    return bytes(out)


def _rice_cost(resid: list[int], k: int) -> int:
    cost = 0
    for v in resid:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        cost += (u >> k) + 1 + k
    return cost


def _best_rice_k(resid: list[int], max_k: int = 14) -> tuple[int, int]:
    best_k, best_c = 0, _rice_cost(resid, 0)
    for k in range(1, max_k + 1):
        c = _rice_cost(resid, k)
        if c < best_c:
            best_k, best_c = k, c
    return best_k, best_c


def _fixed_residual(x: list[int], order: int) -> list[int]:
    coeffs = _FIXED_COEFFS[order]
    return [
        x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coeffs))
        for i in range(order, len(x))
    ]


def _write_subframe(w: _BitWriter, x: list[int], bps: int, force_verbatim: bool) -> None:
    bs = len(x)
    if force_verbatim:
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in x:
            w.write(v & ((1 << bps) - 1), bps)
        return
    if all(v == x[0] for v in x):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(x[0] & ((1 << bps) - 1), bps)
        return
    # exhaustive FIXED order 0-2 by exact rice cost, with VERBATIM as a
    # candidate too — at wide bps (24/32-bit, r12) residual magnitudes
    # outgrow the 4-bit Rice parameter ceiling (k ≤ 14) and unary
    # quotients explode ~1000×; VERBATIM bounds the subframe at bs·bps
    best = None
    for order in range(0, 3):
        if bs <= order:
            continue
        resid = _fixed_residual(x, order)
        k, cost = _best_rice_k(resid)
        total = order * bps + cost
        if best is None or total < best[0]:
            best = (total, order, resid, k)
    if best[0] > bs * bps:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in x:
            w.write(v & ((1 << bps) - 1), bps)
        return
    _, order, resid, k = best
    w.write(0, 1)
    w.write(8 + order, 6)
    w.write(0, 1)  # no wasted bits
    for v in x[:order]:
        w.write(v & ((1 << bps) - 1), bps)
    w.write(0, 2)  # rice method 0
    w.write(0, 4)  # partition order 0
    w.write(k, 4)
    for v in resid:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        w.write_unary(u >> k)
        if k:
            w.write(u & ((1 << k) - 1), k)
