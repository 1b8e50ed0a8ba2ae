"""PII scrub: positive-match behavior on literal fixtures (the synthetic
corpus contains no PII, so the declared query's oracle parity only proves
the engines agree on zeros — these fixtures pin the actual semantics),
plus a DuckDB cross-engine check that the Java and RE2 dialects of the
patterns match the same spans."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from simsearch_spark.functions.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    email_count,
    ipv4_count,
    phone_count,
    redact,
)

FIXTURES = [
    # (text, n_emails, n_ipv4, n_phones, redacted)
    ("contact alice@example.com today", 1, 0, 0, "contact <EMAIL> today"),
    ("a.b+tag@sub.domain.org and bob@x.io", 2, 0, 0, "<EMAIL> and <EMAIL>"),
    ("server at 10.0.0.1 down", 0, 1, 0, "server at <IP> down"),
    ("call +1 555 123 4567 now", 0, 0, 1, "call <PHONE> now"),
    ("tel 0301234567.", 0, 0, 1, "tel <PHONE>."),
    # an IP must NOT double-count as a phone (redaction order contract)
    ("ip 192.168.001.255 only", 0, 1, 0, "ip <IP> only"),
    ("mixed: x@y.de 8.8.8.8 (030) 123-4567", 1, 1, 1, "mixed: <EMAIL> <IP> <PHONE>"),
    ("no pii here", 0, 0, 0, "no pii here"),
    ("short digits 12345 stay", 0, 0, 0, "short digits 12345 stay"),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame([(t,) for t, *_ in FIXTURES], ["text"])
    t = F.col("text")
    return df.select(
        "text",
        email_count(t).alias("n_emails"),
        ipv4_count(t).alias("n_ipv4"),
        phone_count(t).alias("n_phones"),
        redact(t).alias("redacted"),
    ).collect()


def test_counts_and_redaction(scrubbed):
    got = {r["text"]: r for r in scrubbed}
    for text, ne, ni, np_, red in FIXTURES:
        r = got[text]
        assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == (ne, ni, np_), text
        assert r["redacted"] == red, text


def test_duckdb_dialect_agrees(scrubbed):
    """The oracle's RE2 reading of the same patterns must produce identical
    counts and redactions on the positive fixtures — the guarantee the
    zero-PII corpus parity cannot give."""
    con = duckdb.connect()
    for r in scrubbed:
        row = con.execute(
            f"""
            SELECT len(regexp_extract_all(?, '{EMAIL_RE}')),
                   len(regexp_extract_all(?, '{IPV4_RE}')),
                   len(regexp_extract_all(
                     regexp_replace(regexp_replace(?, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                    '{IPV4_RE}', '<IP>', 'g'), '{PHONE_RE}')),
                   regexp_replace(regexp_replace(regexp_replace(
                     ?, '{EMAIL_RE}', '<EMAIL>', 'g'), '{IPV4_RE}', '<IP>', 'g'),
                     '{PHONE_RE}', '<PHONE>', 'g')
            """,
            [r["text"]] * 4,
        ).fetchone()
        assert row == (r["n_emails"], r["n_ipv4"], r["n_phones"], r["redacted"]), r["text"]
