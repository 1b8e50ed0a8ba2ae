"""CCITT Group 3 / Group 4 bilevel codecs (ITU-T T.4 / T.6) — the TIFF
compressions 2 (modified Huffman, byte-aligned rows, no EOLs), 3 (T.4
G3: EOL-delimited lines, optional 2D/MR lines via the tag bit) and 4
(T.6 G4: pure 2D MMR against an all-white imaginary reference line).

VERDICT r12 task 3: unlike the arithmetic-JPEG Qe table, the T.4/T.6
code tables (terminating + makeup codes, the 2D mode codes) are short,
published in the ITU recommendations, and mechanically verifiable by
encoder/decoder round-trip plus hand-derived bit vectors
(tests/test_ccitt.py).  Bilevel fax/scan archives are the dominant
real-world TIFF population, so this closes the codec matrix's largest
remaining seam.

Representation: a decoded line is its list of TRANSITION positions
(strictly increasing column indices where the colour changes; colour
before the first transition is WHITE).  This is the native vocabulary of
the 2D modes — b1/b2 lookups are bisects, vertical/pass/horizontal all
manipulate positions — and rows pack to MSB-first bits only at the edge
(white = 0, black = 1; TIFF photometric 0, the CCITT norm).

PERMANENT pin (r14, both raise NotImplementedError): T.4/T.6
uncompressed mode (T4Options/T6Options bit 1 + the in-stream entry
code) and the other 2D extension codes.  Uncompressed mode is an
OPTIONAL negotiated fax capability that no mainstream TIFF writer
emits, so a from-scratch implementation would have no independently
producible conformant fixture to cross-check against — the same
rationale that pinned arithmetic-coded JPEG.  The codes stay loud
seams, never silent misdecodes (tests/test_ccitt.py pins both).
"""

from __future__ import annotations

from bisect import bisect_right

__all__ = [
    "ccitt_decode",
    "ccitt_encode_g3_1d",
    "ccitt_encode_g3_eol",
    "ccitt_encode_g4",
    "rows_to_bits",
    "bits_to_rows",
]

# --- ITU-T T.4 table 1/2: white run codes (terminating 0..63 + makeup) ---
_WHITE_TERM = [
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100",
    "110101", "101010", "101011", "0100111", "0001100", "0001000",
    "0010111", "0000011", "0000100", "0101000", "0101011", "0010011",
    "0100100", "0011000", "00000010", "00000011", "00011010", "00011011",
    "00010010", "00010011", "00010100", "00010101", "00010110", "00010111",
    "00101000", "00101001", "00101010", "00101011", "00101100", "00101101",
    "00000100", "00000101", "00001010", "00001011", "01010010", "01010011",
    "01010100", "01010101", "00100100", "00100101", "01011000", "01011001",
    "01011010", "01011011", "01001010", "01001011", "00110010", "00110011",
    "00110100",
]
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

# --- ITU-T T.4 table 3: black run codes ---
_BLACK_TERM = [
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100",
    "00000111", "000011000", "0000010111", "0000011000", "0000001000",
    "00001100111", "00001101000", "00001101100", "00000110111",
    "00000101000", "00000010111", "00000011000", "000011001010",
    "000011001011", "000011001100", "000011001101", "000001101000",
    "000001101001", "000001101010", "000001101011", "000011010010",
    "000011010011", "000011010100", "000011010101", "000011010110",
    "000011010111", "000001101100", "000001101101", "000011011010",
    "000011011011", "000001010100", "000001010101", "000001010110",
    "000001010111", "000001100100", "000001100101", "000001010010",
    "000001010011", "000000100100", "000000110111", "000000111000",
    "000000100111", "000000101000", "000001011000", "000001011001",
    "000000101011", "000000101100", "000001011010", "000001100110",
    "000001100111",
]
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# --- extended makeup codes, shared by both colours (runs 1792..2560) ---
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

EOL = "000000000001"

# 2D mode codes (T.4 §4.2.1.3.7, shared by T.6)
_MODE_PASS = "0001"
_MODE_HORIZ = "001"
_MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
           -1: "010", -2: "000010", -3: "0000010"}
#: the 2D extension escape (T.4 ext. mode / T.6 uncompressed entry)
_MODE_EXT_PREFIX = "0000001"


def _decode_tables():
    white = {}
    for n, code in enumerate(_WHITE_TERM):
        white[code] = ("t", n)
    for n, code in _WHITE_MAKEUP.items():
        white[code] = ("m", n)
    black = {}
    for n, code in enumerate(_BLACK_TERM):
        black[code] = ("t", n)
    for n, code in _BLACK_MAKEUP.items():
        black[code] = ("m", n)
    for n, code in _EXT_MAKEUP.items():
        white[code] = ("m", n)
        black[code] = ("m", n)
    return white, black


_DEC_WHITE, _DEC_BLACK = _decode_tables()
_MAX_CODE_LEN = 14  # longest run code is 13 bits; one spare for safety


class _Bits:
    """MSB-first bit cursor with save/rewind (the EOL probe needs it)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def read(self) -> int:
        if self.pos >= self.n:
            raise ValueError("CCITT stream exhausted")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def eof(self) -> bool:
        return self.pos >= self.n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(bits: _Bits, black: bool) -> int:
    """One complete run length: zero or more makeup codes followed by a
    terminating code (runs > 2560 chain extended makeups)."""
    table = _DEC_BLACK if black else _DEC_WHITE
    total = 0
    while True:
        code = ""
        while len(code) <= _MAX_CODE_LEN:
            code += "1" if bits.read() else "0"
            hit = table.get(code)
            if hit is not None:
                kind, n = hit
                break
        else:
            raise ValueError(
                f"invalid CCITT {'black' if black else 'white'} code {code!r}"
            )
        total += n
        if kind == "t":
            return total


def _decode_1d_line(bits: _Bits, width: int) -> list[int]:
    """One MH-coded line → transition positions.  Runs alternate starting
    white; a zero-length first white run is how a line opens black (a
    zero-length run elsewhere cancels its transition — tolerated, some
    writers emit them around makeup boundaries)."""
    trans: list[int] = []
    pos = 0
    black = False
    while pos < width:
        run = _read_run(bits, black)
        pos += run
        if pos > width:
            raise ValueError(f"CCITT run past line width ({pos} > {width})")
        if pos < width:
            if trans and trans[-1] == pos:
                trans.pop()
            else:
                trans.append(pos)
        black = not black
    return trans


def _find_b1(ref: list[int], a0: int, color: int, width: int) -> tuple[int, int]:
    """(b1, b2) per T.4/T.6: b1 is the first reference transition > a0
    whose NEW colour is opposite the coding colour — with the transition
    list convention, index parity == coding colour."""
    i = bisect_right(ref, a0)
    if (i & 1) != color:
        i += 1
    b1 = ref[i] if i < len(ref) else width
    b2 = ref[i + 1] if i + 1 < len(ref) else width
    return b1, b2


#: prefix-free 2D mode table: code string → (kind, vertical offset)
_MODE_TABLE = {
    _MODE_PASS: ("pass", 0),
    _MODE_HORIZ: ("horiz", 0),
    **{c: ("v", d) for d, c in _MODE_V.items()},
}


def _append_trans(trans: list[int], pos: int, width: int) -> None:
    if pos >= width:
        return
    if trans and pos <= trans[-1]:
        raise ValueError(f"CCITT 2D transition {pos} not increasing")
    trans.append(pos)


def _decode_2d_line(bits: _Bits, width: int, ref: list[int]) -> list[int]:
    """One 2D (MR/MMR) line against reference transitions ``ref``."""
    trans: list[int] = []
    a0 = -1
    color = 0  # white
    while a0 < width:
        b1, b2 = _find_b1(ref, a0, color, width)
        code = ""
        while True:
            code += "1" if bits.read() else "0"
            mode = _MODE_TABLE.get(code)
            if mode is not None:
                break
            if code == _MODE_EXT_PREFIX:
                raise NotImplementedError(
                    "CCITT 2D extension / uncompressed mode"
                )
            if len(code) > 7:
                raise ValueError(f"invalid CCITT 2D mode code {code!r}")
        kind, d = mode
        if kind == "pass":
            a0 = b2
        elif kind == "horiz":
            r1 = _read_run(bits, bool(color))
            r2 = _read_run(bits, not bool(color))
            start = max(a0, 0)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > width:
                raise ValueError("CCITT horizontal runs past line width")
            _append_trans(trans, a1, width)
            _append_trans(trans, a2, width)
            a0 = a2
        else:  # vertical
            a1 = b1 + d
            if a1 < 0 or a1 > width:
                raise ValueError("CCITT vertical move past line bounds")
            _append_trans(trans, a1, width)
            a0 = a1
            color ^= 1
    return trans


def _try_eol(bits: _Bits, two_d: bool) -> int | None:
    """Consume one EOL (with any leading fill zeros); returns the tag bit
    (1 = next line 1D, 0 = 2D) when ``two_d``, else 1.  Rewinds and
    returns None when no EOL is present at the cursor."""
    save = bits.pos
    zeros = 0
    try:
        while True:
            b = bits.read()
            if b == 0:
                zeros += 1
                continue
            if zeros >= 11:
                return bits.read() if two_d else 1
            bits.pos = save
            return None
    except ValueError:
        bits.pos = save
        return None


def _pack(lines: list[list[int]], width: int, invert: bool = False) -> bytes:
    """Transition lines → MSB-first packed rows, byte-aligned (white = 0,
    black = 1; ``invert`` flips for BlackIsZero photometrics)."""
    stride = (width + 7) // 8
    out = bytearray(stride * len(lines))
    for y, trans in enumerate(lines):
        row_off = y * stride
        color = 0
        prev = 0
        for t in trans + [width]:
            if color:
                for x in range(prev, t):
                    out[row_off + (x >> 3)] |= 0x80 >> (x & 7)
            prev = t
            color ^= 1
        if invert:
            for i in range(stride):
                out[row_off + i] ^= 0xFF
            # clear pad bits past the row width
            if width & 7:
                out[row_off + stride - 1] &= (0xFF << (8 - (width & 7))) & 0xFF
    return bytes(out)


def ccitt_decode(
    data: bytes,
    width: int,
    rows: int,
    compression: int,
    t4_options: int = 0,
    invert: bool = False,
) -> bytes:
    """Decode a TIFF CCITT strip to packed 1-bit rows (byte-aligned,
    MSB-first, white = 0).  ``compression``: 2 = MH with byte-aligned
    rows and no EOLs, 3 = T.4 G3 (EOL per line; ``t4_options`` bit 0
    enables 2D lines via tag bits, bit 1 — uncompressed mode — is a
    named seam), 4 = T.6 G4 (pure MMR, imaginary all-white reference)."""
    if compression not in (2, 3, 4):
        raise ValueError(f"not a CCITT compression: {compression}")
    if compression == 3 and t4_options & 0b10:
        raise NotImplementedError("T.4 uncompressed mode (T4Options bit 1)")
    bits = _Bits(data)
    two_d_stream = compression == 3 and bool(t4_options & 1)
    lines: list[list[int]] = []
    ref: list[int] = []
    for y in range(rows):
        if compression == 2:
            if y:
                bits.align()
            lines.append(_decode_1d_line(bits, width))
        elif compression == 4:
            line = _decode_2d_line(bits, width, ref)
            lines.append(line)
            ref = line
        else:  # G3
            tag = _try_eol(bits, two_d_stream)
            if tag is None and y == 0:
                tag = 1  # writers may omit the leading EOL
            if tag is None:
                raise ValueError(f"CCITT G3: missing EOL before line {y}")
            if tag:
                line = _decode_1d_line(bits, width)
            else:
                line = _decode_2d_line(bits, width, ref)
            lines.append(line)
            ref = line
    return _pack(lines, width, invert)


# --- encoders -----------------------------------------------------------


def _encode_run(out: list[str], run: int, black: bool) -> None:
    term = _BLACK_TERM if black else _WHITE_TERM
    makeup = _BLACK_MAKEUP if black else _WHITE_MAKEUP
    while run > 2560:
        out.append(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 1792:
        step = (run // 64) * 64
        out.append(_EXT_MAKEUP[step])
        run -= step
    elif run >= 64:
        step = (run // 64) * 64
        out.append(makeup[step])
        run -= step
    out.append(term[run])


def _line_runs(trans: list[int], width: int) -> list[int]:
    """Transition positions → alternating run lengths starting white."""
    runs = []
    prev = 0
    for t in trans + [width]:
        runs.append(t - prev)
        prev = t
    return runs


def _bits_to_bytes(chunks: list[str]) -> bytes:
    s = "".join(chunks)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def rows_to_bits(gray: bytes, width: int, rows: int) -> list[list[int]]:
    """Two-tone gray rows ({0, 255} bytes, row-major) → per-line
    transition positions (255 = white)."""
    if len(gray) != width * rows:
        raise ValueError(f"pixel buffer {len(gray)} != {width}x{rows}")
    lines = []
    for y in range(rows):
        row = gray[y * width : (y + 1) * width]
        trans = []
        color = 0  # white
        for x, v in enumerate(row):
            if v not in (0, 255):
                raise ValueError(f"CCITT encode needs two-tone {{0,255}}, got {v}")
            bit = 0 if v == 255 else 1
            if bit != color:
                trans.append(x)
                color = bit
        lines.append(trans)
    return lines


def bits_to_rows(packed: bytes, width: int, rows: int) -> bytes:
    """Packed 1-bit rows (white = 0) → two-tone gray bytes."""
    stride = (width + 7) // 8
    out = bytearray(width * rows)
    for y in range(rows):
        for x in range(width):
            bit = (packed[y * stride + (x >> 3)] >> (7 - (x & 7))) & 1
            out[y * width + x] = 0 if bit else 255
    return bytes(out)


def _encode_1d_line(trans: list[int], width: int) -> list[str]:
    out: list[str] = []
    black = False
    for run in _line_runs(trans, width):
        _encode_run(out, run, black)
        black = not black
    return out


def ccitt_encode_g3_1d(lines: list[list[int]], width: int) -> bytes:
    """TIFF compression 2: MH rows, each starting on a byte boundary, no
    EOL codes."""
    chunks: list[str] = []
    for trans in lines:
        row = "".join(_encode_1d_line(trans, width))
        row += "0" * (-len(row) % 8)
        chunks.append(row)
    return _bits_to_bytes(chunks)


def ccitt_encode_g3_eol(lines: list[list[int]], width: int) -> bytes:
    """TIFF compression 3, 1D: a T.4 EOL before every line."""
    chunks: list[str] = []
    for trans in lines:
        chunks.append(EOL)
        chunks.extend(_encode_1d_line(trans, width))
    return _bits_to_bytes(chunks)


def ccitt_encode_g4(lines: list[list[int]], width: int) -> bytes:
    """TIFF compression 4: T.6 MMR — every line 2D-coded against the
    previous (imaginary all-white first reference), EOFB terminated."""
    chunks: list[str] = []
    ref: list[int] = []
    for trans in lines:
        a0 = -1
        color = 0
        while a0 < width:
            b1, b2 = _find_b1(ref, a0, color, width)
            i = bisect_right(trans, a0)
            a1 = trans[i] if i < len(trans) else width
            a2 = trans[i + 1] if i + 1 < len(trans) else width
            if b2 < a1:
                chunks.append(_MODE_PASS)
                a0 = b2
            elif abs(a1 - b1) <= 3:
                chunks.append(_MODE_V[a1 - b1])
                a0 = a1
                color ^= 1
            else:
                chunks.append(_MODE_HORIZ)
                start = max(a0, 0)
                _encode_run(chunks, a1 - start, bool(color))
                _encode_run(chunks, a2 - a1, not bool(color))
                a0 = a2
        ref = trans
    # T.6 §4.2.2: EOFB is two consecutive BARE EOL codewords — tag bits
    # exist only in T.4's 2D mode (review r13: the first cut appended
    # EOL+1 pairs, which a strict external G4 validator rejects)
    chunks.append(EOL + EOL)
    return _bits_to_bytes(chunks)
