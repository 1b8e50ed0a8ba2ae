"""Shared PCM sample-conversion helpers for the audio codecs (r12)."""

from __future__ import annotations

__all__ = ["float_to_int16"]


def float_to_int16(v: float) -> int:
    """IEEE float sample (±1.0 full scale) → int16.

    Clamps BEFORE rounding: a corrupt/adversarial payload can carry
    ±inf (``round(inf)`` raises OverflowError, which is outside the
    codecs' bounded-exception contract) or NaN (maps to 0, the usual
    DSP convention).  ``s/32768.0`` is exactly representable in float32
    for every int16, so in-range values round-trip losslessly."""
    if v != v:  # NaN
        return 0
    v = v * 32768.0
    if v <= -32768.0:
        return -32768
    if v >= 32767.0:
        return 32767
    return int(round(v))
