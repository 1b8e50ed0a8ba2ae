"""Tests for character-trigram language ID v2 (functions/langid.py) — the
r8 judge task: the stopword heuristic is trivially defeated by token
mutation; the trigram profile scorer must survive it, with the stopword
path kept as the cheap pre-filter.
"""

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

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
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
