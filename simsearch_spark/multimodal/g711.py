"""ITU-T G.711 companding (μ-law / A-law) — the telephony audio codings
real corpora carry inside WAV containers (format tags 7 and 6).  From
scratch, dependency-free, like every sibling codec (no reference-engine
counterpart — LLM-pipeline surface, SURVEY.md §6).

Public knowledge: ITU-T Recommendation G.711 (1988) segment companding;
the segment-search construction follows the classic Sun/CCITT reference
code shape.  Both directions are verified EXHAUSTIVELY against an
independent implementation in tests/test_g711.py — every int16 encodes
identically and all 256 codes decode identically to CPython's ``audioop``
(itself the CCITT reference) — so this is a cross-implementation-checked
codec, not a self-consistent reinvention.

Decode closed forms (the SQL-oracle-friendly property):

- μ-law: ``u = ~code & 0xFF``; sign ``u & 0x80``; ``e = (u>>4) & 7``;
  ``m = u & 15``; magnitude ``((8m + 132) << e) - 132``.
- A-law: ``a = code ^ 0x55``; sign bit SET means positive; ``e``/``m`` as
  above; magnitude ``16m + 8`` for ``e == 0`` else
  ``((m + 16) << (e+3)) + (1 << (e+2))``.

μ-law quantization is idempotent on its 255 representable levels (and
A-law on its 256): ``encode(decode(c)) == c`` for every code — so a
synthesized wave whose amplitudes are drawn from the closed-form
representable set round-trips LOSSLESSLY, which is what lets the media
queries keep exact closed-form oracles through a lossy codec.
"""

from __future__ import annotations

__all__ = ["ulaw_encode", "ulaw_decode", "alaw_encode", "alaw_decode"]

_SEG_UEND = (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)
_SEG_AEND = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def ulaw_encode(x: int) -> int:
    """int16 → μ-law code byte (G.711 §A; 14-bit segment search with the
    arithmetic >>2 BEFORE the sign fold — the CCITT order, which differs
    from the naive 16-bit construction on a handful of extremes)."""
    p = x >> 2
    if p < 0:
        p = -p
        mask = 0x7F
    else:
        mask = 0xFF
    if p > 8159:
        p = 8159
    p += 33  # BIAS 0x84 >> 2
    for seg, end in enumerate(_SEG_UEND):
        if p <= end:
            return ((seg << 4) | ((p >> (seg + 1)) & 0xF)) ^ mask
    return 0x7F ^ mask


def ulaw_decode(code: int) -> int:
    """μ-law code byte → int16."""
    u = ~code & 0xFF
    e = (u >> 4) & 7
    m = u & 0xF
    v = ((8 * m + 132) << e) - 132
    return -v if u & 0x80 else v


def alaw_encode(x: int) -> int:
    """int16 → A-law code byte (G.711 §B; 13-bit segment search, even-bit
    inversion mask 0x55)."""
    p = x >> 3
    if p >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        p = -p - 1
    for seg, end in enumerate(_SEG_AEND):
        if p <= end:
            aval = seg << 4
            if seg < 2:
                aval |= (p >> 1) & 0xF
            else:
                aval |= (p >> seg) & 0xF
            return aval ^ mask
    return 0x7F ^ mask


def alaw_decode(code: int) -> int:
    """A-law code byte → int16 (sign bit of ``code ^ 0x55`` SET means
    positive — the even-bit-inversion convention)."""
    a = code ^ 0x55
    e = (a >> 4) & 7
    m = a & 0xF
    if e == 0:
        t = (m << 4) + 8
    else:
        t = ((m + 16) << (e + 3)) + (1 << (e + 2))
    return t if a & 0x80 else -t
