"""Tests for character-trigram language ID v2 (functions/langid.py) — the
r8 judge task: the stopword heuristic is trivially defeated by token
mutation; the trigram profile scorer must survive it, with the stopword
path kept as the cheap pre-filter.
"""

import pytest
from pyspark.sql import functions as F

from simsearch_spark.functions.langid import (
    LANGS,
    PROFILES,
    _SEEDS,
    lang_id_v2,
    trigram_lang,
    trigram_scores_micro,
)


def _score_py(text: str) -> list[int]:
    """Independent pure-Python replay of the scoring contract."""
    s = (text or "").lower()
    out = []
    for lang in LANGS:
        prof = PROFILES[lang]
        out.append(sum(prof.get(s[i : i + 3], 0) for i in range(max(len(s) - 2, 0))))
    return out


def _one(spark, col, text):
    return (
        spark.createDataFrame([(text,)], "t string")
        .select(col(F.col("t")).alias("v"))
        .first()
        .v
    )


def test_profiles_deterministic_and_ascii():
    for lang in LANGS:
        assert all(ord(c) < 128 for c in _SEEDS[lang]), lang
        prof = PROFILES[lang]
        assert len(prof) == 64
        assert all(isinstance(w, int) and w > 0 for w in prof.values())
        assert all(len(t) == 3 for t in prof)


def test_scores_match_python_reference(spark):
    texts = [
        "the cat sat on the mat and it was warm in the sun",
        "der hund und die katze sind in dem haus mit der zeit",
        "le chien et le chat sont dans la maison pour le jour",
        "el perro y el gato estan en la casa para la gente",
        "xy",       # too short: all-zero
        "",          # empty
        None,        # NULL
        "zzz qqq vvv",  # no profile trigram at all
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select("t", trigram_scores_micro(F.col("t")).alias("sc")).collect()
    for r in rows:
        assert list(r.sc) == _score_py(r.t), r.t


def test_trigram_lang_classifies_each_seed_language(spark):
    # each seed's own text must classify as its language — and so must a
    # short natural sentence per language
    for lang in LANGS:
        assert _one(spark, trigram_lang, _SEEDS[lang]) == lang
    assert _one(spark, trigram_lang, "it is the best of all the things in the world") == "en"
    assert _one(spark, trigram_lang, "und der wagen ist nicht mit dem zug gekommen") == "de"


def test_suffix_mutation_defeats_stopwords_but_not_trigrams(spark):
    """The r8 probe construction: every token suffixed. Stopword lang_id
    says 'und'; the trigram fallback inside lang_id_v2 still classifies."""
    from simsearch_spark.functions.text import lang_id

    en = "the quick brown fox jumps over the lazy dog and it was the best of times"
    de = "der schnelle braune fuchs springt uber den faulen hund und es war die beste aller zeiten"
    en_m = " ".join(w + "_9" for w in en.split())
    de_m = " ".join(w + "_9" for w in de.split())
    assert _one(spark, lang_id, en_m) == "und"  # stopword path defeated
    assert _one(spark, lang_id, de_m) == "und"
    assert _one(spark, lang_id_v2, en_m) == "en"  # trigram fallback recovers
    assert _one(spark, lang_id_v2, de_m) == "de"


def test_kernel_equals_column_chain(spark, sf_dir):
    """The fused Arrow kernel (the query path) is byte-identical to the
    column-expression chain on the live fixture PLUS edge cases — the
    corpus_features_frame equality discipline."""
    from simsearch_spark.functions.langid import (
        langid_frame,
        trigram_lang_from_scores,
    )
    from simsearch_spark.functions.text import lang_id
    from simsearch_spark.sources.registry import load_table

    # bounded fixture slice: Catalyst's literal-map chain is a LINEAR scan
    # over ~380 trigram keys per position (why the kernel exists) — 120
    # real docs keep the equality check strong at ~1/10 the wall time the
    # 6-language profile table would otherwise cost here
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(120)
    )
    edge = spark.createDataFrame(
        [
            (9001, None),
            (9002, ""),
            (9003, "   "),
            (9004, "the quick brown fox and the lazy dog"),
            (9005, " ".join(w + "_9" for w in "der hund und die katze".split())),
            (9006, "café naïve 中文 \U0001f600 the end"),
            (9007, "tab\tand\nnewline  double  space"),
        ],
        "doc_id long, text string",
    )
    df = docs.union(edge)
    kernel = {r.doc_id: tuple(r) for r in langid_frame(df, "doc_id", "text").collect()}

    sc = trigram_scores_micro(F.col("text"))
    tri = trigram_lang_from_scores(F.col("_sc"))
    chain_df = (
        df.select("doc_id", lang_id(F.col("text")).alias("lang_sw"), sc.alias("_sc"))
        .select(
            "doc_id",
            "lang_sw",
            *[F.col("_sc")[i].alias(f"score_{l}") for i, l in enumerate(LANGS)],
            tri.alias("lang_tri"),
            F.when(F.col("lang_sw") != F.lit("und"), F.col("lang_sw"))
            .otherwise(tri)
            .alias("lang_pred"),
        )
    )
    chain = {r.doc_id: tuple(r) for r in chain_df.collect()}
    assert kernel == chain


def test_v2_stopword_prefilter_decides_when_it_has_evidence(spark):
    """When the stopword path has ANY evidence its verdict stands — v2 must
    not pay the trigram fold or override the cheap verdict."""
    from simsearch_spark.functions.text import lang_id

    # 'la' is a stopword for both fr and es; fr wins the ratio tie-break —
    # v2 must return the stopword verdict even where trigrams might differ
    t = "la maison"
    assert _one(spark, lang_id, t) == _one(spark, lang_id_v2, t)
    # degenerate inputs classify 'und' end to end
    for t in (None, "", "   ", "zz"):
        assert _one(spark, lang_id_v2, t) == "und"


def test_nfc_frame_decomposed_and_null(spark):
    """Unicode NFC audit (functions/text.py nfc_frame): decomposed input
    normalizes (shorter, different fingerprint), composed input is a
    fixed point, the uncomposable combining mark survives, NULL
    propagates NULL."""
    from simsearch_spark.functions.text import nfc_frame

    composed = "café naïve"
    decomposed = "café naïve"
    rows = {
        r.doc_id: r
        for r in nfc_frame(
            spark.createDataFrame(
                [(1, composed), (2, decomposed), (3, "q́x"), (4, None)],
                "doc_id long, text string",
            ),
            "doc_id",
            "text",
        ).collect()
    }
    assert rows[1].was_decomposed is False and rows[1].n_chars_nfc == len(composed)
    assert rows[2].was_decomposed is True and rows[2].n_chars_nfc == len(composed)
    # after normalization the two spell the SAME string → same fingerprint
    assert rows[1].fp_nfc == rows[2].fp_nfc
    # combining acute on 'q' has no composed form: normalized but unchanged
    assert rows[3].was_decomposed is False and rows[3].n_chars_nfc == 3
    assert rows[4].was_decomposed is None and rows[4].fp_nfc is None


# -----------------------------------------------------------------------------
# corpus-derived profiles (r10): train_profiles as a mount-time artifact
# -----------------------------------------------------------------------------


def _mutate(text: str, seed: int, sfx: str) -> str:
    """Held-out mutation: rotate word order deterministically and suffix
    every word — the stopword-defeating transformation the trigram scorer
    exists to survive."""
    words = text.split()
    k = seed % len(words)
    return " ".join(w + sfx for w in words[k:] + words[:k])


def test_train_profiles_matches_build_profile_arithmetic(spark):
    """Distributed training replays _build_profile exactly: same top-k
    selection (count desc, trigram asc) and the same exact integer
    micro-weights, for every language, when fed the seed texts themselves."""
    from simsearch_spark.functions.langid import _SEEDS, PROFILES, train_profiles

    df = spark.createDataFrame(
        [(lang, _SEEDS[lang]) for lang in LANGS], "lang string, text string"
    )
    trained = train_profiles(df, "text", "lang")
    assert set(trained) == set(LANGS)
    for lang in LANGS:
        assert trained[lang] == PROFILES[lang], lang


def test_train_profiles_accuracy_on_held_out_mutations(spark):
    """The LM/IVF artifact pattern end-to-end: train profiles on a labeled
    sample (several mutated variants per language), classify HELD-OUT
    differently-mutated documents — including the two new languages —
    and demand high accuracy where the stopword heuristic scores 0."""
    from simsearch_spark.functions.langid import (
        _SEEDS,
        train_profiles,
        trigram_lang,
    )
    from simsearch_spark.functions.text import lang_id

    train_rows = [
        (lang, _mutate(_SEEDS[lang], s, f"_{s}")) for lang in LANGS for s in (1, 2, 3)
    ]
    trained = train_profiles(
        spark.createDataFrame(train_rows, "lang string, text string"), "text", "lang"
    )
    held = spark.createDataFrame(
        [(lang, _mutate(_SEEDS[lang], 7, "_7x")) for lang in LANGS],
        "lang string, text string",
    ).persist()
    scored = held.select(
        "lang",
        trigram_lang(F.col("text"), trained).alias("pred"),
        lang_id(F.col("text")).alias("sw"),
    ).collect()
    # the suffix mutation kills the stopword heuristic entirely...
    assert all(r.sw == "und" for r in scored)
    # ...while corpus-trained trigram profiles still classify every doc,
    # it and pt included
    acc = sum(1 for r in scored if r.pred == r.lang) / len(scored)
    assert acc == 1.0, [(r.lang, r.pred) for r in scored]


def test_trained_profiles_replay_through_sql_oracle(spark):
    """A trained artifact replays through the SAME oracle shape as the
    embedded defaults: DuckDB scores from profile_sql_values(trained)
    equal the Spark literal-map scores, trigram for trigram."""
    import duckdb

    from simsearch_spark.functions.langid import (
        _SEEDS,
        profile_sql_values,
        train_profiles,
        trigram_scores_micro,
    )

    df = spark.createDataFrame(
        [(lang, _SEEDS[lang]) for lang in ("en", "it", "pt")], "lang string, text string"
    )
    trained = train_profiles(df, "text", "lang")
    langs = tuple(trained)  # sorted lane order
    docs = [
        (0, "la volpe salta sopra il cane pigro ogni giorno del mese"),
        (1, "a raposa salta sobre o cao todos os dias do mes para ver"),
        (2, "the fox jumps over the dog every single day of the month"),
        (3, None),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: list(r.sc)
        for r in sdf.select(
            "doc_id", trigram_scores_micro(F.col("text"), trained).alias("sc")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    lanes = ",\n".join(
        f"coalesce(max(CASE WHEN lang = '{l}' THEN sm END), 0)::BIGINT AS s_{l}"
        for l in langs
    )
    rows = con.sql(f"""
WITH prof(lang, tri, w) AS (VALUES {profile_sql_values(trained)}),
t AS (SELECT doc_id, lower(coalesce(text, '')) AS s FROM d),
pos AS (SELECT doc_id, s, unnest(range(1, length(s) - 1)) AS i FROM t WHERE length(s) >= 3),
hit AS (
  SELECT p.doc_id, pr.lang, sum(pr.w)::BIGINT AS sm
  FROM pos p JOIN prof pr ON substr(p.s, p.i::INT, 3) = pr.tri GROUP BY 1, 2
)
SELECT t.doc_id, {lanes.replace('max(CASE', 'max(CASE')}
FROM t LEFT JOIN hit ON t.doc_id = hit.doc_id GROUP BY t.doc_id
""").fetchall()
    oracle = {r[0]: [int(x) for x in r[1:]] for r in rows}
    assert got == oracle
    # the trained sample really classifies: it/pt/en docs argmax correctly
    for doc_id, lang in ((0, "it"), (1, "pt"), (2, "en")):
        sc = got[doc_id]
        assert langs[sc.index(max(sc))] == lang


def test_train_profiles_label_guard(spark):
    from simsearch_spark.functions.langid import train_profiles

    df = spark.range(100).select(
        F.col("id").cast("string").alias("lang"), F.lit("some text here").alias("text")
    )
    with pytest.raises(ValueError, match="exceeds max_langs"):
        train_profiles(df, "text", "lang", max_langs=10)
