"""Winnowing fingerprints: the SIGMOD'03 guarantees, degenerate shapes, and
the MOSS overlap join (operators/winnow.py)."""

import pytest
from pyspark.sql import functions as F

from simsearch_spark.operators.winnow import winnow_fingerprints, winnow_overlap_pairs

K, W = 3, 4


def _fps(spark, rows, k=K, w=W):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return winnow_fingerprints(df, "doc_id", "text", k, w).collect()


def test_winnow_guarantee_every_window_covered(spark):
    """The winnowing guarantee: every run of w consecutive k-gram positions
    contains at least one selected fingerprint position."""
    text = " ".join(f"tok{i * 7919 % 101}" for i in range(60))
    rows = _fps(spark, [(1, text)])
    pos = sorted(r.pos for r in rows)
    n_kg = 60 - (K - 1)
    assert pos[0] <= W - 1 and pos[-1] >= n_kg - W
    for a, b in zip(pos, pos[1:]):
        assert b - a <= W, f"gap {a}->{b} exceeds window"


def test_winnow_density_is_sampled_not_full(spark):
    text = " ".join(f"tok{i * 7919 % 101}" for i in range(60))
    rows = _fps(spark, [(1, text)])
    assert len(rows) < (60 - K + 1) / 2  # ~2/(w+1) density, far below 1


def test_winnow_short_doc_single_partial_kgram(spark):
    rows = _fps(spark, [(1, "ab")])  # < k tokens: one partial k-gram
    assert len(rows) == 1 and rows[0].pos == 0


def test_winnow_fewer_kgrams_than_window(spark):
    rows = _fps(spark, [(1, "a b c d")])  # 2 k-grams < w: one rightmost-min
    assert len(rows) == 1


def test_winnow_rightmost_tie_break(spark):
    """All-equal hashes: each window selects its RIGHTMOST position, so the
    selection is every position from the first full window's end onward."""
    n = 10
    rows = _fps(spark, [(1, " ".join(["x"] * n))])
    n_kg = n - (K - 1)
    assert sorted(r.pos for r in rows) == list(range(W - 1, n_kg))
    assert len({r.fp for r in rows}) == 1


def test_winnow_null_and_blank_drop(spark):
    rows = _fps(spark, [(1, None), (2, "   "), (3, "a b c d e f")])
    assert {r.doc_id for r in rows} == {3}


def test_winnow_overlap_shared_run_and_max_df_cut(spark):
    """Two docs sharing a long token run pair up; a fingerprint present in
    every doc (boilerplate) is cut by max_df and creates no pairs alone."""
    shared = " ".join(f"s{i}" for i in range(20))
    boiler = "the quick brown fox jumps"
    rows = [
        (1, shared + " alpha beta gamma"),
        (2, "delta " + shared + " epsilon"),
        (3, boiler + " unrelated words entirely here now"),
        (4, boiler + " other totally different content here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", K, W)
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_overlap_pairs(fps, "doc_id", min_shared=2, max_df=100).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    # boilerplate-only overlap (3,4) shares the boiler k-grams; with
    # max_df=1 every shared fingerprint is "boilerplate" and all pairs die
    none = winnow_overlap_pairs(fps, "doc_id", min_shared=1, max_df=1).collect()
    assert none == []


def test_winnow_position_bound_raises(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["t"] * ((1 << 20) + K - 1)))], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="position bound|chunk"):
        winnow_fingerprints(df, "doc_id", "text", K, W).collect()


def test_passage_removal_planted_spans(spark):
    """Removal semantics over a planted shared passage: the lower doc id
    WINS and keeps its text verbatim; the loser has (only) k-gram spans
    inside the shared passage cut, overlaps merged; the cleaned-text hash
    matches an independent pure-Python replay of the rules from the
    collected fingerprints; a unique doc is untouched."""
    from simsearch_spark.operators.winnow import passage_removal, winnow_fingerprints

    shared = "common run one two three four five six"  # 8 tokens >= w+K-1
    d1 = "alpha beta gamma " + shared + " tail one"
    d2 = "x y " + shared + " z zz zzz"
    d3 = "totally unique words that never repeat anywhere else at all"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in passage_removal(df, "doc_id", "text", K, W, min_df=2).collect()
    }
    assert set(out) == {1, 2, 3}
    # winner (doc 1) and the unique doc keep everything
    for i, txt in ((1, d1), (3, d3)):
        assert out[i].n_removed == 0 and out[i].n_spans == 0
        assert out[i].n_kept == out[i].n_tokens == len(txt.split(" "))
        assert out[i].clean_hash == _py_charfold(txt)
    # loser: at least one k-gram of the shared passage cut, nothing outside
    fps = winnow_fingerprints(df, "doc_id", "text", K, W).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    shared_fps = {f for _, f in by_doc[1]} & {f for _, f in by_doc[2]}
    assert shared_fps, "winnowing guarantee: an 8-token run must share a fingerprint"
    w2 = d2.split(" ")
    covered = set()
    for pos, f in by_doc[2]:
        if f in shared_fps:
            covered |= {i for i in range(pos, pos + K) if i < len(w2)}
    spans = sum(1 for i in covered if i - 1 not in covered)
    clean = " ".join(t for i, t in enumerate(w2) if i not in covered)
    r2 = out[2]
    assert r2.n_tokens == len(w2)
    assert r2.n_removed == len(covered) > 0
    assert r2.n_kept == len(w2) - len(covered)
    assert r2.n_spans == spans
    assert r2.clean_hash == _py_charfold(clean)
    # every cut index sits inside the planted shared-passage window of doc 2
    start = 2  # "x y " prefix
    assert all(start <= i < start + 8 for i in covered)


def _py_charfold(s: str, mod: int = 1_000_000_007) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % mod
    return h
