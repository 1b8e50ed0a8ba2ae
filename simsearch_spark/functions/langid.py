"""Character-trigram language identification (v2) — the Cavnar-Trenkle
n-gram-profile idea reduced to an oracle-replayable integer kernel.

Why v2 exists: the stopword-ratio heuristic (functions/text.py lang_id) is
trivially defeated by token-level mutation — suffix every word and the
stopword hit-rate drops to zero, so the whole corpus classifies "und"
(observed in the r8 scale probe, where suffixed replicas all failed the
corpus_clean language filter).  Character trigrams survive such mutations:
"the_1 fast_1" still contains "the", "he_", "fas", "ast" …, so a trigram
profile still votes the right language.

Design (all public knowledge: Cavnar & Trenkle 1994, "N-Gram-Based Text
Categorization"):

- A per-language PROFILE is built at import time from a small embedded
  ASCII seed text: the top ``PROFILE_K`` trigrams of the lowercased seed,
  weighted by their frequency in INTEGER MICRO-UNITS
  (``count * 1e6 // total_positions``).  The profile is a deterministic
  mount-time artifact, like lm_perplexity's LM — and because every weight
  is an integer, a document's score is an exact BIGINT sum in any engine
  and any aggregation order (the established float-fold defense).
- Scoring is ROW-LOCAL: one fold over the document's trigram positions,
  looking each trigram up in a constant-folded literal map of weight
  vectors (one array<long> lane per language) — no shuffle, no UDF, pure
  codegen expressions.  100 TB shape: embarrassingly parallel scan.
- ``lang_id_v2`` keeps the stopword heuristic as the CHEAP PRE-FILTER:
  when stopword evidence exists (any hit), its verdict stands (a handful
  of `isin` probes per token); only stopword-blind documents pay the
  trigram fold.
- The DuckDB oracle replays the identical computation from the same
  constants: ``profile_sql_values()`` renders the profile as a VALUES
  table, positions unnest via ``range``, and the per-language score is the
  same BIGINT sum (see queries/corpus.py SQL_LANG_ID_TRIGRAM).

Reference parity note: the reference engine has no language-ID operator
(LLM-pipeline extension surface, SURVEY.md §6).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column
from pyspark.sql import functions as F

from simsearch_spark.operators.fanout import fanout_for_kernel as _fanout

from simsearch_spark.functions.text import lang_id

__all__ = [
    "LANGS",
    "PROFILES",
    "PROFILE_K",
    "trigram_scores_micro",
    "trigram_lang",
    "lang_id_v2",
    "profile_sql_values",
    "train_profiles",
]

#: fixed language order — argmax tie-break and the lane order of the
#: packed weight vectors (must match the CASE ordering in the oracle SQL;
#: queries/corpus.py generates its lanes from this tuple).  it/pt joined
#: in r10 — profile-only languages: the stopword pre-filter never predicts
#: them (LANG_STOPWORDS is unchanged), the trigram scorer does.
LANGS = ("en", "de", "fr", "es", "it", "pt")

#: trigrams kept per language profile.  64 is plenty to separate four
#: languages and keeps the oracle's VALUES table ≤256 rows.
PROFILE_K = 64

# Embedded ASCII seed texts (public-domain phrase stock: pangrams, opening
# lines, common function-word runs).  Deliberately ASCII-only — accented
# forms are dropped so Spark/DuckDB lower()/substr() can never disagree on
# code points — and single-spaced so profile construction needs no
# whitespace normalization.
_SEEDS = {
    "en": (
        "the quick brown fox jumps over the lazy dog and it was the best of "
        "times it was the worst of times it is a truth universally "
        "acknowledged that a single man in possession of a good fortune must "
        "be in want of a wife all happy families are alike each unhappy "
        "family is unhappy in its own way this is the day that we have made "
        "and we will rejoice in it for the people of the world and all that "
        "is in it the rain in spain stays mainly in the plain"
    ),
    "de": (
        "der schnelle braune fuchs springt uber den faulen hund und es war "
        "die beste aller zeiten es war die schlimmste aller zeiten alle "
        "glucklichen familien gleichen einander jede ungluckliche familie "
        "ist auf ihre eigene weise unglucklich dies ist der tag den wir "
        "gemacht haben und wir werden uns an ihm freuen fur die menschen der "
        "welt und alles was darin ist der regen in spanien bleibt meistens "
        "in der ebene und die zeit vergeht schnell in dem land"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et c "
        "etait le meilleur des temps c etait le pire des temps toutes les "
        "familles heureuses se ressemblent chaque famille malheureuse l est "
        "a sa facon ceci est le jour que nous avons fait et nous nous en "
        "rejouirons pour les gens du monde et tout ce qui s y trouve la "
        "pluie en espagne reste surtout dans la plaine et le temps passe "
        "vite dans le pays des lumieres et de la liberte"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y era el "
        "mejor de los tiempos era el peor de los tiempos todas las familias "
        "felices se parecen cada familia infeliz lo es a su manera este es "
        "el dia que hemos hecho y nos alegraremos en el para la gente del "
        "mundo y todo lo que hay en el la lluvia en espana se queda sobre "
        "todo en la llanura y el tiempo pasa rapido en el pais de la vida"
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro ed era il "
        "migliore dei tempi era il peggiore dei tempi tutte le famiglie "
        "felici si somigliano ogni famiglia infelice lo e a modo suo questo "
        "e il giorno che abbiamo fatto e ci rallegreremo in esso per la "
        "gente del mondo e tutto cio che vi si trova la pioggia in spagna "
        "resta soprattutto nella pianura e il tempo passa veloce nel paese "
        "della vita e della liberta che tutti gli uomini vogliono avere"
    ),
    "pt": (
        "a rapida raposa marrom salta sobre o cao preguicoso e era o melhor "
        "dos tempos era o pior dos tempos todas as familias felizes se "
        "parecem cada familia infeliz o e a sua maneira este e o dia que "
        "fizemos e nos alegraremos nele para as pessoas do mundo e tudo o "
        "que nele existe a chuva na espanha fica principalmente na planicie "
        "e o tempo passa depressa no pais da vida e da liberdade que todos "
        "os homens querem ter para as suas familias"
    ),
}


def _build_profile(seed: str, k: int = PROFILE_K) -> dict[str, int]:
    """Top-k trigrams of the lowercased seed with integer micro-weights.
    Deterministic: ties broken by trigram text ascending."""
    s = seed.lower()
    counts = Counter(s[i : i + 3] for i in range(len(s) - 2))
    total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {t: c * 1_000_000 // total for t, c in top}


PROFILES: dict[str, dict[str, int]] = {l: _build_profile(_SEEDS[l]) for l in LANGS}

# the union trigram table: trigram -> one weight lane per language, in
# LANGS order (0 where the trigram is outside that language's top-k)
_ALL_TRIS = sorted(set().union(*[set(p) for p in PROFILES.values()]))


def _langs_of(profiles: dict[str, dict[str, int]] | None) -> tuple[str, ...]:
    """The lane order of a profile set: LANGS for the embedded default,
    insertion order (sorted at train time) for a trained artifact."""
    return LANGS if profiles is None else tuple(profiles)


def _weight_map(profiles: dict[str, dict[str, int]] | None = None) -> Column:
    prof = PROFILES if profiles is None else profiles
    langs = _langs_of(profiles)
    tris = _ALL_TRIS if profiles is None else sorted(
        set().union(*[set(p) for p in prof.values()])
    )
    entries: list[Column] = []
    for t in tris:
        entries.append(F.lit(t))
        entries.append(
            F.array(*[F.lit(prof[l].get(t, 0)).cast("long") for l in langs])
        )
    return F.create_map(*entries)  # literal → constant-folded by Catalyst


def trigram_scores_micro(
    col: Column, profiles: dict[str, dict[str, int]] | None = None
) -> Column:
    """array<long> of per-language trigram scores in lane order (LANGS for
    the default profiles, key order for a trained set): the exact BIGINT
    sum of profile micro-weights over every trigram position of
    ``lower(col)``.  Row-local single fold; NULL/short (<3 chars) text
    scores all-zero."""
    langs = _langs_of(profiles)
    s = F.lower(F.coalesce(col, F.lit("")))
    n = F.length(s)
    m = _weight_map(profiles)
    zero = F.array(*[F.lit(0).cast("long") for _ in langs])
    folded = F.aggregate(
        F.sequence(F.lit(1), n - 2),
        zero,
        lambda acc, i: F.zip_with(
            acc,
            F.coalesce(F.element_at(m, F.substring(s, i, F.lit(3))), zero),
            lambda a, b: a + b,
        ),
    )
    # sequence(1, n-2) would COUNT DOWN for n < 3 (Spark defaults to step
    # -1 when start > stop) — guard the degenerate case explicitly
    return F.when(n >= 3, folded).otherwise(zero)


def trigram_lang_from_scores(
    scores: Column, langs: tuple[str, ...] = LANGS
) -> Column:
    """argmax language from an already-computed score vector (lane order =
    ``langs``); 'und' when all zero.  Deterministic tie-break: lane order,
    strict > (same contract as the stopword lang_id).  Take the vector
    from a single ``trigram_scores_micro`` column so the fold is not
    re-evaluated per language."""
    best_lang = F.lit("und")
    best = F.lit(0).cast("long")
    for i, lang in enumerate(langs):
        sc = scores[i]
        take = sc > best
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best = F.when(take, sc).otherwise(best)
    return best_lang


def trigram_lang(
    col: Column, profiles: dict[str, dict[str, int]] | None = None
) -> Column:
    """argmax language of the trigram scores; 'und' when all zero."""
    return trigram_lang_from_scores(
        trigram_scores_micro(col, profiles), _langs_of(profiles)
    )


def lang_id_v2(col: Column) -> Column:
    """Composed language ID: the stopword heuristic decides when it has any
    evidence (cheap pre-filter — a few token `isin` probes); documents it
    cannot classify ('und': zero stopword hits, e.g. suffix-mutated text)
    fall through to the trigram profile scorer."""
    sw = lang_id(col)
    return F.when(sw != F.lit("und"), sw).otherwise(trigram_lang(col))


def langid_frame(df, id_col: str, text_col: str,
                 profiles: dict[str, dict[str, int]] | None = None):
    """(id, lang_sw, score_en..score_es, lang_tri, lang_pred) in ONE
    Arrow-batched pass — the fused kernel behind the lang_id_trigram
    surface query.  Byte-identical to the column-expression chain
    (``lang_id`` + ``trigram_scores_micro`` + the argmax/composition
    rules; equality-tested in tests/test_langid.py): integer micro-weight
    sums are exact in any engine, and the stopword ratios use the same
    IEEE division.  Why: Catalyst's GetMapValue on a literal map is a
    LINEAR scan over all ~200 keys per trigram position (measured 11 s at
    sf0.1); a dict lookup per position with all four language lanes fetched
    at once is ~6× faster.  Same shuffle-free row-local contract.

    ``profiles``: a trained/mounted profile artifact in place of the
    embedded seed defaults (the mount-layer serve path,
    ``mount/serve.py serve_lang_id``); lane order = key order, exactly as
    ``trigram_scores_micro``."""
    from collections.abc import Iterator

    import pandas as pd

    from simsearch_spark.functions.text import LANG_STOPWORDS

    prof = PROFILES if profiles is None else profiles
    langs = _langs_of(profiles)
    all_tris = _ALL_TRIS if profiles is None else sorted(
        set().union(*[set(p) for p in prof.values()])
    )
    tri_w = {t: tuple(prof[l].get(t, 0) for l in langs) for t in all_tris}
    n_langs = len(langs)
    lane_idx = range(n_langs)
    stopsets = [(lang, frozenset(sw)) for lang, sw in LANG_STOPWORDS.items()]
    # Java's \s (non-UNICODE_CHARACTER_CLASS) is ASCII-only — Python's \s
    # is unicode-aware, so spell the class out to match F.split exactly
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    id_dtype = dict(df.dtypes)[id_col]

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                id_col: [], "lang_sw": [],
                **{f"score_{l}": [] for l in langs},
                "lang_tri": [], "lang_pred": [],
            }
            for doc_id, t in zip(pdf[id_col], pdf[text_col]):
                s = (t or "").lower()
                # stopword pre-filter (ws_tokens contract: split, drop "")
                toks = [x for x in ws.split(s) if x != ""]
                n = len(toks)
                sw_lang, sw_best = "und", 0.0
                for lang, sset in stopsets:
                    ratio = (
                        sum(1 for x in toks if x in sset) / n if n else 0.0
                    )
                    if ratio > sw_best:
                        sw_lang, sw_best = lang, ratio
                # trigram profile scores (exact integer micro-weights)
                sc = [0] * n_langs
                get = tri_w.get
                for i in range(len(s) - 2):
                    w = get(s[i : i + 3])
                    if w is not None:
                        for li in lane_idx:
                            sc[li] += w[li]
                tri_lang, tri_best = "und", 0
                for li, lang in enumerate(langs):
                    if sc[li] > tri_best:
                        tri_lang, tri_best = lang, sc[li]
                cols[id_col].append(doc_id)
                cols["lang_sw"].append(sw_lang)
                for li, lang in enumerate(langs):
                    cols[f"score_{lang}"].append(sc[li])
                cols["lang_tri"].append(tri_lang)
                cols["lang_pred"].append(sw_lang if sw_lang != "und" else tri_lang)
            yield pd.DataFrame(cols)

    score_cols = ", ".join(f"score_{l} long" for l in langs)
    return _fanout(df.select(id_col, text_col), id_col).mapInPandas(
        proc,
        f"{id_col} {id_dtype}, lang_sw string, {score_cols}, "
        "lang_tri string, lang_pred string",
    )


def profile_sql_values(profiles: dict[str, dict[str, int]] | None = None) -> str:
    """A profile set as a SQL VALUES body — (lang, tri, w) rows, identical
    constants to the Spark literal map, for the DuckDB oracle.  Works for
    the embedded default AND any ``train_profiles`` artifact, so a trained
    profile replays through the same oracle shape."""
    prof = PROFILES if profiles is None else profiles
    rows = []
    for lang in _langs_of(profiles):
        for t, w in sorted(prof[lang].items()):
            esc = t.replace("'", "''")
            rows.append(f"('{lang}', '{esc}', {w})")
    return ", ".join(rows)


def train_profiles(
    df,
    text_col: str,
    label_col: str,
    k: int = PROFILE_K,
    max_langs: int = 64,
) -> dict[str, dict[str, int]]:
    """Build Cavnar-Trenkle integer micro-weight profiles FROM A LABELED
    CORPUS SAMPLE — the mount-time-artifact pattern (like lm_perplexity's
    LM or IVF centroids): run once over a labeled frame, persist the
    returned dict, and pass it to ``trigram_scores_micro`` /
    ``trigram_lang`` / ``profile_sql_values`` in place of the embedded
    seed defaults.

    Identical weight arithmetic to ``_build_profile``: per label, the top
    ``k`` trigrams of the lowercased text by count (ties by trigram text
    ascending), weighted ``count * 1e6 // total_positions``.

    100 TB shape: trigram extraction is a row-local transform+explode; the
    (label, trigram) count and per-label total are ONE map-side-combinable
    aggregation each; top-k per label is a bounded window; only
    ``n_langs × k`` rows ever reach the driver.  ``max_langs`` guards the
    label column the way ``exact_grouped_quantile_cont`` guards groups —
    profiles are per-LANGUAGE state, not per-row state."""
    from pyspark.sql import Window

    s = F.lower(F.col(text_col))
    n = F.length(s)
    tris = F.transform(
        F.sequence(F.lit(1), n - 2), lambda i: F.substring(s, i, F.lit(3))
    )
    base = (
        df.where(F.col(label_col).isNotNull() & F.col(text_col).isNotNull() & (n >= 3))
        .select(F.col(label_col).alias("_lang"), F.explode(tris).alias("_tri"))
    )
    n_langs = int(base.agg(F.countDistinct("_lang")).first()[0])
    if n_langs > max_langs:
        raise ValueError(
            f"train_profiles: {n_langs} distinct labels in {label_col!r} "
            f"exceeds max_langs={max_langs}; pass a language label, not a "
            "document key"
        )
    counts = base.groupBy("_lang", "_tri").agg(F.count(F.lit(1)).alias("c"))
    w_total = Window.partitionBy("_lang")
    w_rank = Window.partitionBy("_lang").orderBy(F.col("c").desc(), F.col("_tri").asc())
    top = (
        counts.withColumn("_total", F.sum("c").over(w_total))
        .withColumn("_rn", F.row_number().over(w_rank))
        .where(F.col("_rn") <= int(k))
        # integral `div`, never float division: c*1e6/total as a double can
        # round across the floor boundary; _build_profile uses exact //
        .select("_lang", "_tri", F.expr("c * 1000000L div _total").alias("w"))
        .collect()
    )
    out: dict[str, dict[str, int]] = {}
    for r in top:
        out.setdefault(str(r["_lang"]), {})[str(r["_tri"])] = int(r["w"])
    return {lang: out[lang] for lang in sorted(out)}
