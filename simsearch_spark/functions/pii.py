"""PII detection / redaction primitives (emails, IPv4 addresses, phone-ish
number runs).

The scrubbing pass every training-data pipeline runs before release.  All
JVM-side ``regexp_extract_all`` / ``regexp_replace`` column expressions —
no UDF, stays in whole-stage codegen, embarrassingly parallel (no shuffle).

The patterns are deliberately restricted to syntax with identical
semantics in Java regex (Spark) and RE2/PCRE (DuckDB oracle): character
classes, bounded repetition, ``\\b`` word boundaries — no lookaround, no
backreferences.  Redaction order is EMAIL → IPV4 → PHONE so the broader
phone pattern can never eat the digits of an already-matched IP.

Reference scope note: the reference engine has no scrubbing operator;
this is part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
#: 8+ digit runs allowing separators — intentionally recall-heavy, the
#: usual trade for scrubbing
PHONE_RE = r"[+(]?[0-9][0-9()\- ]{6,}[0-9]"

_ORDERED = [(EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")]


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def email_count(col: Column) -> Column:
    return _count(col, EMAIL_RE)


def ipv4_count(col: Column) -> Column:
    return _count(col, IPV4_RE)


def phone_count(col: Column) -> Column:
    """Counted AFTER email/IP redaction so an IP's digit run is not
    double-reported as a phone number."""
    masked = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    masked = F.regexp_replace(masked, IPV4_RE, "<IP>")
    return _count(masked, PHONE_RE)


def redact(col: Column) -> Column:
    """Replace every PII match with its typed placeholder, EMAIL → IPV4 →
    PHONE."""
    out = col
    for pattern, token in _ORDERED:
        out = F.regexp_replace(out, pattern, token)
    return out
