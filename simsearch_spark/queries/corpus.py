"""Declared query: the composed training-data cleaning pipeline — the
operators this engine adds beyond the reference, chained the way a real
pre-training corpus pass runs them:

    quality score -> language filter -> exact-dedup keeper selection
    -> per-document token statistics

One declarative plan (filters push into the scan; the dedup groupBy is the
only shuffle), oracle-checked end-to-end so the composition — not just the
pieces — is verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simsearch_spark.functions.text import corpus_features_frame
from simsearch_spark.queries.pipeline import _NORM_TEXT, _WS_TOKS, _charfold_sql
from simsearch_spark.queries.pipeline import SQL_TEXT_LANG_ID, SQL_TEXT_QUALITY  # noqa: F401 (fragment provenance)
from simsearch_spark.sources.registry import load_table

QUALITY_T = 0.5


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one Arrow-batched pass computes every per-document feature (quality,
    # language, fingerprint, token count) — equality-tested against the
    # column-expression versions; measured ~5x at sf0.1 over the four
    # interpreted HOF chains.  The authoritative round-6 stays JVM-side.
    docs = load_table(spark, sf_dir, "documents")
    feats = corpus_features_frame(docs, "doc_id", "text").withColumn(
        "quality", F.round(F.col("quality_raw"), 6)
    )
    kept = feats.where((F.col("quality") >= QUALITY_T) & (F.col("lang_pred") == "en"))
    # exact dedup among survivors: keep the smallest doc_id per fingerprint
    w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
    keepers = kept.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    return keepers.select("doc_id", "quality", "n_tokens", "fingerprint")


# oracle: replay the same composition with the proven SQL fragments
_sw_en = "['the', 'and', 'of', 'to', 'in', 'is', 'that', 'it', 'was', 'for']"
_PUNCT_RE = "'[!-/:-@\\[-`{-~]'"

_LANG_LISTS = {
    "en": _sw_en,
    "de": "['der', 'die', 'und', 'das', 'ist', 'nicht', 'ein', 'mit', 'von', 'zu']",
    "fr": "['le', 'la', 'et', 'les', 'des', 'est', 'dans', 'que', 'une', 'pour']",
    "es": "['el', 'la', 'de', 'que', 'los', 'una', 'por', 'con', 'para', 'es']",
}
_ratio = {
    lang: f"(CASE WHEN len(toks) = 0 THEN 0.0 ELSE len(list_filter(toks, t -> list_contains({lst}, t)))::DOUBLE / len(toks)::DOUBLE END)"
    for lang, lst in _LANG_LISTS.items()
}

SQL_CORPUS_CLEAN = f"""
WITH t AS (
  SELECT doc_id, text, length(text) AS n,
         length(text) - length(regexp_replace(text, {_PUNCT_RE}, '', 'g')) AS n_punct,
         {_WS_TOKS} AS toks
  FROM documents
), q AS (
  SELECT doc_id, text, toks,
         round((least(n::DOUBLE / 500.0, 1.0)
           + (1.0 - least((CASE WHEN n = 0 THEN 0.0 ELSE n_punct::DOUBLE / n::DOUBLE END) * 4, 1.0))
           + least((CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE len(list_filter(toks, t -> list_contains({_sw_en}, t)))::DOUBLE / len(toks)::DOUBLE END) * 5,
                   1.0)) / 3.0, 6) AS quality,
         {_ratio['en']} AS s_en, {_ratio['de']} AS s_de, {_ratio['fr']} AS s_fr, {_ratio['es']} AS s_es
  FROM t
), kept AS (
  SELECT doc_id, text, toks, quality FROM q
  WHERE quality >= {QUALITY_T}
    AND (CASE WHEN s_en <= 0 AND s_de <= 0 AND s_fr <= 0 AND s_es <= 0 THEN 'und'
              WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              WHEN s_fr >= s_es THEN 'fr'
              ELSE 'es' END) = 'en'
), fp AS (
  SELECT doc_id, quality, toks, {_charfold_sql(_NORM_TEXT)} AS fingerprint FROM kept
), keepers AS (
  SELECT doc_id, quality, toks, fingerprint,
         row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM fp
)
SELECT doc_id, quality, len(toks) AS n_tokens, fingerprint
FROM keepers WHERE rn = 1
"""


# -----------------------------------------------------------------------------
# text_repetition: Gopher-style repetition signals (duplicate-token fraction,
# top-bigram mass).  The corpus-quality filters every pre-training pipeline
# runs after the cheap length/punct pass; engine extension (the reference has
# no corpus ops).
# -----------------------------------------------------------------------------

DUP_T = 0.7
BIGRAM_T = 0.2


def repetition_frame(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, dup_raw, top_raw): repetition signals in one Arrow
    pass.  Every signal is a function of the document's OWN tokens, so the
    operator is shuffle-free at any scale — a per-(doc, bigram) groupBy
    would shuffle millions of rows to compute doc-local counters (the first
    cut did; 19s → 2s at sf0.1).  Counts are exact ints, the fractions one
    IEEE division each; round-6 stays JVM-side."""
    import re as _re
    from collections.abc import Iterator
    from collections import Counter

    import pandas as pd

    id_dtype = dict(df.dtypes)[id_col]
    ws = _re.compile(r"\s+")

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, dups, tops = [], [], []
            for t in pdf[text_col]:
                if t is None:
                    # match the SQL oracle's NULL propagation exactly:
                    # NULL toks → NULL n_tokens and dup fraction, but the
                    # oracle's coalesce(mx/tot, 0.0) makes the bigram mass
                    # 0.0, and the rounded-flag OR then yields NULL
                    ns.append(None)
                    dups.append(None)
                    tops.append(0.0)
                    continue
                toks = [w for w in ws.split(t.lower()) if w]
                n = len(toks)
                ns.append(n)
                dups.append(0.0 if n == 0 else 1.0 - len(set(toks)) / n)
                if n < 2:
                    tops.append(0.0)
                else:
                    counts = Counter(zip(toks, toks[1:]))
                    tops.append(max(counts.values()) / (n - 1))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_tokens": ns, "dup_raw": dups, "top_raw": tops}
            )

    return df.select(id_col, text_col).mapInPandas(
        proc, f"{id_col} {id_dtype}, n_tokens int, dup_raw double, top_raw double"
    )


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = repetition_frame(docs, "doc_id", "text")
    dup6, top6 = F.round(F.col("dup_raw"), 6), F.round(F.col("top_raw"), 6)
    return feats.select(
        "doc_id",
        "n_tokens",
        dup6.alias("dup_token_frac"),
        top6.alias("top_bigram_frac"),
        # flag from the ROUNDED values so both engines compare identical doubles
        ((dup6 > DUP_T) | (top6 > BIGRAM_T)).alias("repetitive"),
    )


SQL_TEXT_REPETITION = f"""
WITH t AS (
  SELECT doc_id, {_WS_TOKS} AS toks FROM documents
), s AS (
  SELECT doc_id, len(toks) AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE 1.0 - len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE END AS dup_raw,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1])
              ELSE []::VARCHAR[] END AS bigrams
  FROM t
), c AS (
  SELECT doc_id, bg, count(*) AS c
  FROM (SELECT doc_id, unnest(bigrams) AS bg FROM s) GROUP BY doc_id, bg
), m AS (
  SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM c GROUP BY doc_id
)
SELECT s.doc_id, s.n_tokens,
       round(s.dup_raw, 6) AS dup_token_frac,
       round(coalesce(m.mx::DOUBLE / m.tot::DOUBLE, 0.0), 6) AS top_bigram_frac,
       (round(s.dup_raw, 6) > {DUP_T}
        OR round(coalesce(m.mx::DOUBLE / m.tot::DOUBLE, 0.0), 6) > {BIGRAM_T}) AS repetitive
FROM s LEFT JOIN m ON s.doc_id = m.doc_id
"""


# -----------------------------------------------------------------------------
# corpus_sample: deterministic stratified (per-source) hash sampling — the
# domain-mixing primitive: every engine run and the oracle pick the SAME
# rows, no RNG state anywhere (FIXTURES §F4 determinism rule).
# -----------------------------------------------------------------------------

SAMPLE_RATES = {"src0": 300, "src1": 150}  # per-mille keep rates by stratum
SAMPLE_DEFAULT = 200


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simsearch_spark.functions.text import char_fold_hash

    docs = load_table(spark, sf_dir, "documents")
    key = F.concat(F.col("source"), F.lit("|"), F.col("doc_id").cast("string"))
    bucket = F.pmod(char_fold_hash(key), F.lit(1000))
    rate = F.lit(SAMPLE_DEFAULT)
    for src, r in SAMPLE_RATES.items():
        rate = F.when(F.col("source") == src, F.lit(r)).otherwise(rate)
    return (
        docs.withColumn("bucket", bucket)
        .where(F.col("bucket") < rate)
        .select("doc_id", "source", "bucket")
    )


_rate_sql = "CASE source WHEN 'src0' THEN 300 WHEN 'src1' THEN 150 ELSE 200 END"
SQL_CORPUS_SAMPLE = f"""
WITH t AS (
  SELECT doc_id, source,
         {_charfold_sql("source || '|' || doc_id::VARCHAR")} % 1000 AS bucket
  FROM documents
)
SELECT doc_id, source, bucket FROM t WHERE bucket < {_rate_sql}
"""


# -----------------------------------------------------------------------------
# doc_chunks: fixed token-window chunking — the tokenize-and-pack step of a
# pre-training pipeline (long documents become W-token training rows).
# Pure row-local fan-out: sequence→slice→posexplode, no shuffle; output rows
# scale with corpus tokens / W.
# -----------------------------------------------------------------------------

CHUNK_W = 64


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simsearch_spark.functions.text import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(CHUNK_W)).cast("int")
    starts = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunked = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") * CHUNK_W + 1, CHUNK_W)
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


SQL_DOC_CHUNKS = f"""
WITH t AS (
  SELECT doc_id, {_WS_TOKS} AS toks FROM documents
), c AS (
  SELECT doc_id, toks, unnest(generate_series(0, ceil(len(toks) / {CHUNK_W}.0)::INT - 1)) AS chunk_idx
  FROM t WHERE len(toks) > 0
)
SELECT doc_id, chunk_idx,
       len(list_slice(toks, chunk_idx * {CHUNK_W} + 1, (chunk_idx + 1) * {CHUNK_W})) AS chunk_tokens,
       array_to_string(list_slice(toks, chunk_idx * {CHUNK_W} + 1, (chunk_idx + 1) * {CHUNK_W}), ' ') AS chunk_text
FROM c
"""


# -----------------------------------------------------------------------------
# bm25_topk: keyword retrieval over the corpus (operators/bm25.py) — the
# corpus-scale textual dual of the reference's q-gram facet.  Oracle replays
# the exact stats + fold: avgdl is an exact integer-sum average, idf the same
# ln() on both engines, and the per-term sum a left fold in sorted term order.
# -----------------------------------------------------------------------------

BM25_QUERY = ["spark", "join", "window"]
BM25_K = 10


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simsearch_spark.functions.text import ws_tokens
    from simsearch_spark.operators.bm25 import bm25_topk

    # no kernel fan-out: ws_tokens is a codegen'd split — cheaper than a
    # shuffle of the raw text (r14 A/B: 1.07 s fanned vs 0.93 s direct)
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", ws_tokens(F.col("text"))
    )
    return bm25_topk(docs, "doc_id", "toks", BM25_QUERY, BM25_K)


def _bm25_oracle(k: int = BM25_K) -> str:
    from simsearch_spark.operators.bm25 import B, K1

    terms = sorted(set(BM25_QUERY))
    dfs = ",\n         ".join(
        f"sum((len(list_filter(toks, x -> x = '{t}')) > 0)::BIGINT) AS df_{i}"
        for i, t in enumerate(terms)
    )
    norm = f"{K1} * ({1.0 - B} + {B} * len(toks)::DOUBLE / avgdl)"
    score = "0.0"
    for i, t in enumerate(terms):
        idf = f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        tf = f"len(list_filter(toks, x -> x = '{t}'))::DOUBLE"
        score = f"({score} + {idf} * ({tf} * {K1 + 1.0}) / ({tf} + {norm}))"
    return f"""
WITH t AS (
  -- NULL text yields NULL toks; exclude it from stats AND scoring exactly
  -- as the engine's isNotNull filter does
  SELECT doc_id, {_WS_TOKS} AS toks FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT count(*) AS n_docs, avg(len(toks)::DOUBLE) AS avgdl,
         {dfs}
  FROM t
)
SELECT doc_id, round({score}, 6) AS score, len(toks) AS n_tokens
FROM t, s
ORDER BY round({score}, 6) DESC, doc_id ASC LIMIT {k}
"""


SQL_BM25_TOPK = _bm25_oracle()


# -----------------------------------------------------------------------------
# topk_per_source: grouped top-k (best-k documents per stratum by quality) —
# the per-domain selection step after scoring.  One window shuffle keyed by
# the group column; rank never leaves its partition, so the shape holds at
# any group cardinality (skewed groups split by AQE).
# -----------------------------------------------------------------------------

GROUP_TOPK = 5


def q_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = corpus_features_frame(docs, "doc_id", "text").withColumn(
        "quality", F.round(F.col("quality_raw"), 6)
    )
    with_src = feats.join(docs.select("doc_id", "source"), "doc_id")
    w = Window.partitionBy("source").orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    return (
        with_src.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= GROUP_TOPK)
        .select("source", "rank", "doc_id", "quality")
    )


SQL_TOPK_PER_SOURCE = f"""
WITH t AS (
  SELECT doc_id, source, text, length(text) AS n,
         length(text) - length(regexp_replace(text, {_PUNCT_RE}, '', 'g')) AS n_punct,
         {_WS_TOKS} AS toks
  FROM documents
), q AS (
  SELECT doc_id, source,
         round((least(n::DOUBLE / 500.0, 1.0)
           + (1.0 - least((CASE WHEN n = 0 THEN 0.0 ELSE n_punct::DOUBLE / n::DOUBLE END) * 4, 1.0))
           + least((CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE len(list_filter(toks, t -> list_contains({_sw_en}, t)))::DOUBLE / len(toks)::DOUBLE END) * 5,
                   1.0)) / 3.0, 6) AS quality
  FROM t
), r AS (
  SELECT source, doc_id, quality,
         row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS rank
  FROM q
)
SELECT source, rank, doc_id, quality FROM r WHERE rank <= {GROUP_TOPK}
"""


# -----------------------------------------------------------------------------
# benchmark contamination: train/eval k-gram overlap (operators/contamination)
# -----------------------------------------------------------------------------

CONTAM_K = 3  # token n-gram width (real pipelines use 8-13; fixture docs are short)
EVAL_MOD = 13  # doc_id % EVAL_MOD == 0 -> held-out eval split (~7.7%)


def q_doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination report: for every training document, the fraction of
    its distinct k-gram hashes that appear anywhere in the held-out eval
    split (deterministic doc_id split).  Gram extraction is one shuffle-free
    Arrow pass; the eval gram set joins broadcast; the per-doc aggregation
    is the only exchange (operators/contamination.py)."""
    from simsearch_spark.operators.contamination import contamination_report, kgram_hashes

    docs = load_table(spark, sf_dir, "documents")
    # split BEFORE gram extraction: the parity predicate pushes into both
    # scans and each document runs the Arrow kernel exactly once — splitting
    # after extraction would hash the full corpus twice (plan-audited)
    ev = kgram_hashes(docs.where(F.col("doc_id") % EVAL_MOD == 0), "doc_id", "text", CONTAM_K)
    tr = kgram_hashes(docs.where(F.col("doc_id") % EVAL_MOD != 0), "doc_id", "text", CONTAM_K)
    return contamination_report(tr, ev, "doc_id")


_CONTAM_GRAMS = ", ".join(f"w[i+{j + 1}]" for j in range(CONTAM_K))

SQL_DOC_CONTAMINATION = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE text IS NOT NULL AND trim(text) != ''
), hl AS (
  SELECT doc_id, list_transform(range(0, greatest(len(w) - {CONTAM_K - 1}, 1)),
         i -> {_charfold_sql(f"concat_ws(' ', {_CONTAM_GRAMS})")}) AS hs
  FROM toks
), kg AS (
  SELECT DISTINCT doc_id, unnest(hs) AS gh FROM hl
), ev AS (
  SELECT DISTINCT gh FROM kg WHERE doc_id % {EVAL_MOD} = 0
), tr AS (
  SELECT doc_id, gh FROM kg WHERE doc_id % {EVAL_MOD} != 0
)
SELECT tr.doc_id, count(*) AS n_grams, count(ev.gh) AS n_contam,
       round(count(ev.gh) * 1.0 / count(*), 6) AS contam_ratio
FROM tr LEFT JOIN ev ON tr.gh = ev.gh
GROUP BY tr.doc_id
"""


# -----------------------------------------------------------------------------
# lang_id_trigram: character-trigram language ID v2 (stopword pre-filter +
# Cavnar-Trenkle profile scorer, functions/langid.py)
# -----------------------------------------------------------------------------


def q_lang_id_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID v2 over every document: the stopword heuristic as the
    CHEAP PRE-FILTER (a few token `isin` probes; its verdict stands when it
    has any evidence) and the character-trigram profile scorer as the
    fallback for stopword-blind text — the mutation-robust path (suffixed
    tokens zero the stopword signal but leave most trigrams intact; the r8
    probe showed the stopword heuristic alone classifying every suffixed
    replica 'und').

    Emits the FULL per-language trigram score vector (exact BIGINT sums of
    integer micro-weights — order-independent in any engine), both
    verdicts, and the composed prediction, so the oracle verifies the
    profile lookup, the fold, both argmaxes, and the composition rule.

    100 TB shape: entirely row-local, zero shuffles — one fused Arrow
    kernel (``langid_frame``; the column-expression chain is the
    equality-tested reference, tests/test_langid.py — Catalyst's literal-
    map lookup is a linear key scan per position, measured ~6× slower
    than the dict-lookup kernel at sf0.1)."""
    from simsearch_spark.functions.langid import langid_frame

    docs = load_table(spark, sf_dir, "documents")
    return langid_frame(docs, "doc_id", "text")


def _sql_first_max_case(cols: dict[str, str]) -> str:
    """First-max-wins argmax over (lang -> score SQL expr) in dict order,
    'und' when nothing is positive — the SQL mirror of the strict-> fold
    in functions/langid.py (lane order wins ties).  Generated from the
    language list so added languages extend the oracle automatically."""
    langs = list(cols)
    allz = " AND ".join(f"{cols[l]} <= 0" for l in langs)
    chain = f"CASE WHEN {allz} THEN 'und'"
    for i, lang in enumerate(langs[:-1]):
        geq = " AND ".join(f"{cols[lang]} >= {cols[j]}" for j in langs[i + 1:])
        chain += f"\n            WHEN {geq} THEN '{lang}'"
    chain += f"\n            ELSE '{langs[-1]}' END"
    return chain


def _sql_lang_id_trigram() -> str:
    from simsearch_spark.functions.langid import LANGS, profile_sql_values
    from simsearch_spark.functions.text import LANG_STOPWORDS

    ratio = {}
    for lang, sw in LANG_STOPWORDS.items():
        lst = "[" + ", ".join(f"'{w}'" for w in sw) + "]"
        hits = f"len(list_filter(toks, t -> list_contains({lst}, t)))"
        ratio[lang] = (
            f"(CASE WHEN toks IS NULL OR len(toks) = 0 THEN 0.0 "
            f"ELSE {hits}::DOUBLE / len(toks)::DOUBLE END)"
        )
    sw_case = _sql_first_max_case({l: f"r_{l}" for l in LANG_STOPWORDS})
    ratio_sel = ", ".join(f"{ratio[l]} AS r_{l}" for l in LANG_STOPWORDS)
    pv_sel = ",\n         ".join(
        f"coalesce(max(CASE WHEN lang = '{l}' THEN sm END), 0)::BIGINT AS score_{l}"
        for l in LANGS
    )
    j_sel = ",\n         ".join(
        f"coalesce(pv.score_{l}, 0)::BIGINT AS score_{l}" for l in LANGS
    )
    score_cols = ", ".join(f"score_{l}" for l in LANGS)
    tri_case = _sql_first_max_case({l: f"score_{l}" for l in LANGS})
    return f"""
WITH prof(lang, tri, w) AS (VALUES {profile_sql_values()}),
t AS (
  SELECT doc_id, lower(coalesce(text, '')) AS s, {_WS_TOKS} AS toks
  FROM documents
),
sw AS (
  SELECT doc_id, s,
         {sw_case} AS lang_sw
  FROM (
    SELECT doc_id, s, {ratio_sel}
    FROM t
  )
),
pos AS (
  SELECT doc_id, s, unnest(range(1, length(s) - 1)) AS i
  FROM sw WHERE length(s) >= 3
),
hit AS (
  SELECT p.doc_id, pr.lang, sum(pr.w)::BIGINT AS sm
  FROM pos p JOIN prof pr ON substr(p.s, p.i::INT, 3) = pr.tri
  GROUP BY 1, 2
),
pv AS (
  SELECT doc_id,
         {pv_sel}
  FROM hit GROUP BY doc_id
),
j AS (
  SELECT sw.doc_id, sw.lang_sw,
         {j_sel}
  FROM sw LEFT JOIN pv USING (doc_id)
)
SELECT doc_id, lang_sw, {score_cols},
       {tri_case} AS lang_tri,
       CASE WHEN lang_sw != 'und' THEN lang_sw
            ELSE {tri_case} END AS lang_pred
FROM j
"""


# -----------------------------------------------------------------------------
# text_nfc_normalize: Unicode canonicalization audit (two independent NFC
# implementations must agree)
# -----------------------------------------------------------------------------


def q_text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization over every document (functions/text.py
    ``nfc_frame``): composed-vs-decomposed detection, normalized length,
    and the char-fold fingerprint of the NORMALIZED text — the
    canonicalization a multilingual corpus runs before fingerprint dedup.
    The oracle recomputes everything with DuckDB's utf8proc
    ``nfc_normalize`` — an independent Unicode implementation — so the
    normalization itself is cross-checked, not replayed."""
    from simsearch_spark.functions.text import nfc_frame

    docs = load_table(spark, sf_dir, "documents")
    return nfc_frame(docs, "doc_id", "text")


SQL_TEXT_NFC_NORMALIZE = f"""
SELECT doc_id,
       CASE WHEN text IS NULL THEN NULL ELSE nfc_normalize(text) != text END AS was_decomposed,
       (CASE WHEN text IS NULL THEN NULL ELSE length(nfc_normalize(text)) END)::INT AS n_chars_nfc,
       (CASE WHEN text IS NULL THEN NULL
             ELSE {_charfold_sql('nfc_normalize(text)')} END)::BIGINT AS fp_nfc
FROM documents
"""


# -----------------------------------------------------------------------------
# source_quality_threshold: per-source exact quantile thresholds (the
# grouped form of the r9 distributed quantile)
# -----------------------------------------------------------------------------


def q_source_quality_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE quality thresholds — the per-domain curation shape (each
    domain keeps its own best decile, so one spammy domain cannot shift
    every other domain's bar): exact p90 of the round-6 quality score per
    source via ``exact_grouped_quantile_cont`` (operators/quantile.py —
    all groups narrow simultaneously against one broadcast state frame;
    no per-group percentile buffer anywhere), then per source the member
    count and how many documents clear their own source's bar.

    NULL sources are excluded (the repo-wide keyed-operator contract);
    NULL-text documents count toward n_docs but never clear a threshold
    (NULL quality compares false in both engines)."""
    from simsearch_spark.functions.text import quality_score
    from simsearch_spark.operators.quantile import exact_grouped_quantile_cont

    # no kernel fan-out: quality_score is codegen'd JVM expressions — one
    # shuffle of the raw text costs more than it saves (r14 A/B: 3.56 s
    # fanned vs 2.80 s direct at sf0.1)
    docs = load_table(spark, sf_dir, "documents").where(F.col("source").isNotNull())
    scored = docs.select(
        "doc_id", "source", F.round(quality_score(F.col("text")), 6).alias("quality")
    ).persist()
    thr = exact_grouped_quantile_cont(scored, "source", "quality", 0.9)
    thr_frame = spark.createDataFrame(
        sorted(thr.items()), "source string, p90_raw double"
    ).select("source", F.round(F.col("p90_raw"), 6).alias("p90_quality"))
    return (
        scored.join(F.broadcast(thr_frame), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("p90_quality").alias("p90_quality"),  # constant per group
            F.sum(
                F.when(F.col("quality") >= F.col("p90_quality"), 1).otherwise(0)
            ).cast("long").alias("n_top_decile"),
        )
    )


SQL_SOURCE_QUALITY_THRESHOLD = f"""
WITH tq AS ({SQL_TEXT_QUALITY}),
j AS (
  SELECT d.source, t.quality
  FROM documents d JOIN tq t USING (doc_id)
  WHERE d.source IS NOT NULL
),
thr AS (
  SELECT source, round(quantile_cont(quality, 0.9), 6) AS p90_quality
  FROM j GROUP BY source
  HAVING round(quantile_cont(quality, 0.9), 6) IS NOT NULL
)
SELECT j.source, count(*)::BIGINT AS n_docs,
       max(thr.p90_quality) AS p90_quality,
       sum(CASE WHEN j.quality >= thr.p90_quality THEN 1 ELSE 0 END)::BIGINT AS n_top_decile
FROM j JOIN thr USING (source)
GROUP BY j.source
"""


# -----------------------------------------------------------------------------
# corpus curation pipeline: the full modern pre-training recipe, composed
# -----------------------------------------------------------------------------


def q_corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation recipe, every stage previously verified on
    its own, now verified COMPOSED: quality score → language filter →
    exact-dedup keeper selection (the corpus_clean pipeline) → bigram-LM
    log-perplexity scoring (full-corpus LM) → p90 perplexity-tail drop
    over the surviving subset (unscorable docs drop, the
    corpus_quality_filter rule).  Returns each surviving document with the
    scores that admitted it, so the oracle checks every stage's filter AND
    the cross-stage threshold interaction, not just a final count.

    100 TB shape: the union of the component plans — the only additions
    are one doc-keyed join between two persisted doc-sized frames and a
    1-row broadcast threshold, computed by the distributed exact quantile
    (operators/quantile.py histogram narrowing; no single-buffer
    percentile aggregate anywhere in the plan — the r8 scale flag)."""
    from simsearch_spark.operators.quantile import exact_quantile_cont
    from simsearch_spark.queries.vocab import LM_QUALITY_P, q_lm_perplexity

    clean = q_corpus_clean(spark, sf_dir)
    # scores_only: the pipeline LEFT-joins the scores onto its own
    # doc-keyed frame, so lm_score_self's corpus re-attach join (whose
    # only effect is adding (0, NULL) rows for <2-token docs) is
    # redundant here — X ⟕ (docs ⟕ S) ≡ X ⟕ S on the unique key.  Saves
    # one full `documents` scan + one doc-keyed join from the composed
    # plan (tests/test_mount.py::test_lm_scores_only_arm pins the
    # identity bitwise).
    scored = q_lm_perplexity(spark, sf_dir, scores_only=True).select(
        "doc_id", "log_ppl"
    )
    joined = clean.join(scored, "doc_id", "left").persist()
    t_raw = exact_quantile_cont(joined, "log_ppl", LM_QUALITY_P)
    thr = spark.range(1).select(
        F.round(F.lit(t_raw).cast("double"), 6).alias("t")
    )
    return (
        joined.crossJoin(F.broadcast(thr))
        .where(F.col("log_ppl").isNotNull() & (F.col("log_ppl") <= F.col("t")))
        .select("doc_id", "quality", "n_tokens", "log_ppl")
    )


def _sql_curation_pipeline() -> str:
    from simsearch_spark.queries.vocab import LM_QUALITY_P, SQL_LM_PERPLEXITY

    return f"""
WITH clean AS ({SQL_CORPUS_CLEAN}),
lm AS ({SQL_LM_PERPLEXITY}),
j AS (
  SELECT c.doc_id, c.quality, c.n_tokens, l.log_ppl
  FROM clean c LEFT JOIN lm l USING (doc_id)
),
thr AS (
  SELECT round(quantile_cont(log_ppl, {LM_QUALITY_P}), 6) AS t
  FROM j WHERE log_ppl IS NOT NULL
)
SELECT doc_id, quality, n_tokens, log_ppl FROM j, thr
WHERE log_ppl IS NOT NULL AND log_ppl <= t
"""


# -----------------------------------------------------------------------------
# domain curation: per-domain stats + blocklist filter over REAL URL parsing
# -----------------------------------------------------------------------------


def q_domain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain-level corpus curation — the pre-training stage that
    profiles and gates content by web domain (per-domain doc counts,
    per-domain exact-dup rate, and a domain blocklist).  Documents carry no
    URL, so one is synthesized deterministically per doc
    (``https://d<doc_id%7>.<source>.example.com/p/<doc_id>``); the engine
    then runs REAL URL parsing — ``parse_url(url, 'HOST')`` JVM-side — and
    the oracle re-derives the host with an independent string-split, so the
    parse itself is cross-checked rather than replayed.  The blocklist is
    the numeric-subdomain % 5 == 0 rule applied to the PARSED host via
    regexp (domain-string logic, as a real blocklist join would see it).

    100 TB shape: one groupBy(host) shuffle with partial aggregation
    (domain cardinality ≪ corpus); exact-dup rate rides the same shuffle as
    countDistinct over the 64-bit text fingerprint; the blocklist test is a
    row-local regexp on the domain-sized frame — in production the same
    column joins a broadcast blocklist table."""
    from simsearch_spark.functions.text import char_fold_hash

    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://d"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("."),
        F.col("source"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
    )
    tagged = docs.withColumn("host", F.parse_url(url, F.lit("HOST")))
    blocked = (
        F.regexp_extract(F.col("host"), r"^d(\d+)\.", 1).cast("int") % 5 == 0
    )
    return (
        tagged.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(char_fold_hash(F.col("text"))).alias("n_unique"),
        )
        .select(
            "host",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_unique").cast("long").alias("n_unique"),
            F.round(
                F.lit(1.0) - F.col("n_unique").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
            blocked.alias("blocked"),
            F.when(blocked, F.lit(0))
            .otherwise(F.col("n_docs"))
            .cast("long")
            .alias("n_kept"),
        )
    )


SQL_DOMAIN_CURATION = f"""
WITH u AS (
  SELECT doc_id, text,
         'https://d' || (doc_id % 7)::VARCHAR || '.' || source
           || '.example.com/p/' || doc_id::VARCHAR AS url
  FROM documents
),
h AS (
  -- nullif: DuckDB split_part on a NULL url returns '' (not NULL), which
  -- would both crash the later ::INT cast and group under '' while Spark
  -- groups a NULL parse under NULL (regeneration-robustness: a NULL
  -- source must behave identically in both engines)
  SELECT doc_id, text,
         nullif(split_part(split_part(url, '//', 2), '/', 1), '') AS host
  FROM u
),
s AS (
  SELECT host, count(*)::BIGINT AS n_docs,
         count(DISTINCT {_charfold_sql('text')})::BIGINT AS n_unique
  FROM h GROUP BY host
)
SELECT host, n_docs, n_unique,
       round(1.0::DOUBLE - n_unique::DOUBLE / n_docs::DOUBLE, 6) AS dup_rate,
       (nullif(regexp_extract(host, '^d(\\d+)\\.', 1), '')::INT % 5 = 0) AS blocked,
       (CASE WHEN nullif(regexp_extract(host, '^d(\\d+)\\.', 1), '')::INT % 5 = 0
             THEN 0 ELSE n_docs END)::BIGINT AS n_kept
FROM s
"""


# -----------------------------------------------------------------------------
# source mixing weights: temperature-scaled domain sampling proportions
# -----------------------------------------------------------------------------

MIX_ALPHA = 0.5  # sampling temperature: w_s ∝ n_tokens_s^α (α<1 upweights small domains)


def q_source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights for domain mixing — the step that decides
    how often each domain is drawn during training (multinomial sampling
    with temperature, as in the GPT-3/Pile mixture recipes): weight_s ∝
    (token count of source s)^α, normalized.  One groupBy(source) shuffle
    with map-side partial aggregation over the corpus; the per-source frame
    (domain-count-sized, trivially small) then normalizes against a
    broadcast 1-row total — no second corpus pass, no driver loop."""
    from pyspark.sql.window import Window

    from simsearch_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    # NULL-text guard: DuckDB's sum(len(...)) SKIPS NULL rows, while Spark's
    # size() on NULL can yield -1 under legacy sizeOfNull — make the skip
    # explicit so a regenerated fixture with NULL text can't skew n_tokens
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("text").isNotNull(), token_count(F.col("text")))
        ).alias("n_tokens"),
    )
    w_raw = F.pow(F.col("n_tokens").cast("double"), F.lit(MIX_ALPHA))
    # normalize with an unpartitioned window OVER THE AGGREGATED FRAME: a
    # separate `per.agg(sum)` branch would re-evaluate the plan and scan the
    # corpus twice (plan-audited); the single-partition window touches only
    # the domain-count-sized frame, never the corpus
    total = F.sum(w_raw).over(Window.partitionBy())
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(w_raw / total, 6).alias("mix_weight"),
    )


SQL_SOURCE_MIX_WEIGHTS = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs, sum(len({_WS_TOKS}))::BIGINT AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(pow(n_tokens::DOUBLE, {MIX_ALPHA})) AS t FROM per
)
SELECT source, n_docs, n_tokens,
       round(pow(n_tokens::DOUBLE, {MIX_ALPHA}) / t, 6) AS mix_weight
FROM per, tot
"""


# -----------------------------------------------------------------------------
# source mix APPLY: materialize the temperature-mixed sample
# -----------------------------------------------------------------------------

MIX_BUDGET_FRAC = 0.25  # token budget = 25% of the corpus


def q_source_mix_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the mixed training sample the mix WEIGHTS prescribe —
    the second half of the domain-mixing step: a token budget of
    ``MIX_BUDGET_FRAC`` of the corpus is allotted to sources proportional
    to their temperature weights (w ∝ n_tokens^α), each source's keep rate
    is ``min(1, budget·w / n_tokens)`` (capped, as small upweighted domains
    saturate), and membership is decided by the same deterministic
    char-fold hash-threshold contract as ``corpus_sample`` — so the sample
    is reproducible and join-free to audit.

    Scale shape: one corpus groupBy for token counts (map-side partials),
    rate derivation on the domain-sized frame only (window over ~|sources|
    rows), then one broadcast join of the per-source thresholds back to the
    corpus + a row-local hash filter.  No corpus-sized shuffle, no second
    scan, no driver loop.

    Cross-engine determinism: the only order-sensitive float (the weight
    normalizer, a cross-row double sum) is already pinned by the 6-decimal
    round the driver-verified ``source_mix_weights`` hash-matches on; every
    operation downstream of ``round(w, 6)`` is identically parenthesized in
    both engines, and thresholds become integers (ppm) before the compare."""
    from simsearch_spark.functions.text import char_fold_hash, token_count

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum(
            F.when(F.col("text").isNotNull(), token_count(F.col("text")))
        ).alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    w = Window.partitionBy()
    w_raw = F.pow(F.col("n_tokens").cast("double"), F.lit(MIX_ALPHA))
    sel = per.select(
        "source",
        "n_tokens",
        F.round(w_raw / F.sum(w_raw).over(w), 6).alias("w6"),
        F.sum("n_tokens").over(w).alias("tt"),
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(MIX_BUDGET_FRAC)
        * F.col("tt").cast("double")
        * F.col("w6")
        / F.col("n_tokens").cast("double"),
    )
    rates = sel.select(
        "source",
        F.round(F.round(rate, 6) * F.lit(1_000_000.0), 0).cast("long").alias("thr_ppm"),
    )
    key = F.concat(F.col("source"), F.lit("|"), F.col("doc_id").cast("string"))
    return (
        docs.join(F.broadcast(rates), "source")
        .withColumn("bucket_ppm", F.pmod(char_fold_hash(key), F.lit(1_000_000)))
        .where(F.col("bucket_ppm") < F.col("thr_ppm"))
        .select("doc_id", "source", "bucket_ppm", "thr_ppm")
    )


SQL_SOURCE_MIX_APPLY = f"""
WITH per AS (
  SELECT source, sum(len({_WS_TOKS}))::BIGINT AS n_tokens
  FROM documents GROUP BY source HAVING sum(len({_WS_TOKS})) > 0
), tot AS (
  SELECT sum(pow(n_tokens::DOUBLE, {MIX_ALPHA})) AS tw, sum(n_tokens)::BIGINT AS tt
  FROM per
), rates AS (
  SELECT source,
         CAST(round(round(least(1.0,
             {MIX_BUDGET_FRAC} * tt::DOUBLE
             * round(pow(n_tokens::DOUBLE, {MIX_ALPHA}) / tw, 6)
             / n_tokens::DOUBLE), 6) * 1000000.0, 0) AS BIGINT) AS thr_ppm
  FROM per, tot
)
SELECT d.doc_id, d.source,
       {_charfold_sql("d.source || '|' || d.doc_id::VARCHAR")} % 1000000 AS bucket_ppm,
       r.thr_ppm
FROM documents d JOIN rates r USING (source)
WHERE {_charfold_sql("d.source || '|' || d.doc_id::VARCHAR")} % 1000000 < r.thr_ppm
"""


# -----------------------------------------------------------------------------
# leakage-safe train/val split: near-dup components never straddle the split
# -----------------------------------------------------------------------------

VAL_MOD = 10  # ≈10% of component roots land in the validation split


def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val split: every document is assigned by the
    hash of its dedup-component ROOT (min reachable doc_id through the
    MinHash-LSH pair graph; singletons root at themselves), so two near-
    duplicate documents can never land on opposite sides of the split —
    the eval-leakage failure mode of naive row-hash splits.  Work = the
    dedup pair/CC pipeline (dup-graph-sized) + one left broadcast/hash join
    to root the corpus + a hash projection; no corpus-sized shuffle beyond
    the join on doc_id."""
    from simsearch_spark.functions.text import char_fold_hash
    from simsearch_spark.operators.dedup import connected_components
    from simsearch_spark.queries.pipeline import MINHASH_T, N_BANDS, N_HASHES, minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", MINHASH_T, N_HASHES, N_BANDS)
    comp = connected_components(pairs).withColumnRenamed("id", "doc_id")
    # the component frame is dup-graph-sized (docs that HAVE a near-dup),
    # orders of magnitude smaller than the corpus — broadcast it so the
    # corpus side never shuffles (falls back to a doc_id-keyed shuffle-hash
    # join if a pathological corpus overflows the broadcast limit)
    rooted = docs.join(F.broadcast(comp), "doc_id", "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("root")
    )
    split = F.when(
        char_fold_hash(F.col("root").cast("string")) % VAL_MOD == 0, F.lit("val")
    ).otherwise(F.lit("train"))
    return rooted.select("doc_id", "root", split.alias("split"))


def _split_oracle() -> str:
    from simsearch_spark.queries.pipeline import _minhash_oracle

    return f"""
WITH RECURSIVE p AS ({_minhash_oracle()}),
e AS (
  SELECT id_a AS s, id_b AS d FROM p
  UNION
  SELECT id_b AS s, id_a AS d FROM p
),
reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s
),
comp AS (
  SELECT s AS doc_id, least(s, min(d)) AS component FROM reach GROUP BY s
),
rooted AS (
  SELECT doc_id, coalesce(component, doc_id) AS root
  FROM documents LEFT JOIN comp USING (doc_id)
)
SELECT doc_id, root,
       CASE WHEN {_charfold_sql('CAST(root AS VARCHAR)')} % {VAL_MOD} = 0
            THEN 'val' ELSE 'train' END AS split
FROM rooted
"""


SQL_SPLIT_LEAKAGE_SAFE = _split_oracle()


# -----------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of BM25 and dense cosine rankings
# -----------------------------------------------------------------------------

RRF_N = 50  # depth of each input ranking
RRF_C = 60  # RRF constant (Cormack et al.: score = Σ 1/(C + rank))
HYBRID_K = 10


def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval: the BM25 keyword ranking and the
    brute-cosine dense ranking (same fixed query vector as the ANN queries)
    are fused by reciprocal-rank fusion — the standard RAG-era retrieval
    composition.  Each input ranking is a top-N (TakeOrderedAndProject, O(N)
    memory); the fusion is a full-outer join of two N-row frames plus one
    more TakeOrdered — all corpus-sized work stays in the two underlying
    rankers, the fusion itself is constant-sized."""
    from simsearch_spark.functions.text import ws_tokens
    from simsearch_spark.operators.ann import cosine_topk
    from simsearch_spark.operators.bm25 import bm25_topk
    from simsearch_spark.queries.pipeline import ANN_QUERY_ID

    # no kernel fan-out: same codegen'd-split trade as q_bm25_topk (r14
    # A/B: 1.60 s fanned vs 1.35 s direct)
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", ws_tokens(F.col("text"))
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == ANN_QUERY_ID).first().embedding]

    w_bm = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    sparse = (
        bm25_topk(docs, "doc_id", "toks", BM25_QUERY, RRF_N)
        .withColumn("rank_bm25", F.row_number().over(w_bm))
        .select("doc_id", "rank_bm25")
    )
    w_cos = Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    dense = (
        cosine_topk(emb, "vec_id", "embedding", qvec, RRF_N)
        .withColumn("rank_cos", F.row_number().over(w_cos))
        .select(F.col("vec_id").alias("doc_id"), "rank_cos")
    )
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(RRF_C) + F.col("rank_bm25")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(RRF_C) + F.col("rank_cos")), F.lit(0.0)),
        6,
    )
    return (
        sparse.join(dense, "doc_id", "full_outer")
        .withColumn("rrf_score", rrf)
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(HYBRID_K)
        .select("doc_id", "rrf_score", "rank_bm25", "rank_cos")
    )


def _hybrid_oracle() -> str:
    from simsearch_spark.queries.pipeline import ANN_QUERY_ID
    from simsearch_spark.queries.vector import _cosine_sql

    bm25_body = _bm25_oracle(k=RRF_N)
    return f"""
WITH bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank_bm25
  FROM ({bm25_body})
), q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = {ANN_QUERY_ID}
), cs AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY round({_cosine_sql('e.embedding', 'qv')}, 6) DESC,
                            vec_id ASC) AS rank_cos
  FROM embeddings e, q
  ORDER BY round({_cosine_sql('e.embedding', 'qv')}, 6) DESC, vec_id ASC LIMIT {RRF_N}
)
SELECT coalesce(bm.doc_id, cs.doc_id) AS doc_id,
       round(coalesce(1.0 / ({RRF_C} + rank_bm25), 0.0)
           + coalesce(1.0 / ({RRF_C} + rank_cos), 0.0), 6) AS rrf_score,
       rank_bm25, rank_cos
FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.doc_id
ORDER BY rrf_score DESC, doc_id ASC LIMIT {HYBRID_K}
"""


# -----------------------------------------------------------------------------
# quantile_sketch_audit: deterministic bottom-k quantile sketch vs the exact
# quantile — the cheap mergeable tier next to operators/quantile.py, with its
# error measured in-query (r10)
# -----------------------------------------------------------------------------

QSKETCH_K = 256
QSKETCH_P = 0.9


def q_quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p90 of ``n_chars`` from the DETERMINISTIC bottom-k hash
    sample (operators/qsketch.py — k smallest char-fold doc_id hashes; one
    TakeOrderedAndProject, O(k) driver, order/partition/arrival-invariant)
    NEXT TO the exact distributed quantile (operators/quantile.py), with
    the absolute error reported — the audit every sketch deployment runs.
    The oracle replays BOTH arms: the identical ORDER BY hash LIMIT k
    sample + quantile_cont over it, and quantile_cont over the corpus."""
    from simsearch_spark.operators.qsketch import approx_quantile_sketch
    from simsearch_spark.operators.quantile import exact_quantile_cont

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sketch_q, n = approx_quantile_sketch(docs, "doc_id", "n_chars", QSKETCH_P, QSKETCH_K)
    exact_q = exact_quantile_cont(docs, "n_chars", QSKETCH_P)
    out = spark.createDataFrame(
        [(float(QSKETCH_P), QSKETCH_K, n, float(sketch_q), float(exact_q))],
        "p double, k int, n_sampled long, _sq double, _eq double",
    )
    # rounding happens IN-ENGINE (F.round is HALF_UP; python round is
    # banker's and must never touch oracle-compared values)
    return out.select(
        "p", "k", "n_sampled",
        F.round("_sq", 6).alias("sketch_q"),
        F.round("_eq", 6).alias("exact_q"),
        F.round(F.abs(F.col("_sq") - F.col("_eq")), 6).alias("abs_err"),
    )


SQL_QUANTILE_SKETCH_AUDIT = f"""
WITH s AS (
  SELECT n_chars::DOUBLE AS v
  FROM (
    SELECT n_chars, {_charfold_sql("doc_id::VARCHAR")} AS h, doc_id::VARCHAR AS ks
    FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
  )
  ORDER BY h ASC, ks ASC LIMIT {QSKETCH_K}
),
arms AS (
  SELECT (SELECT count(*) FROM s)::BIGINT AS n_sampled,
         (SELECT quantile_cont(v, {QSKETCH_P}) FROM s) AS sq,
         (SELECT quantile_cont(n_chars::DOUBLE, {QSKETCH_P})
          FROM documents WHERE n_chars IS NOT NULL) AS eq
)
SELECT {QSKETCH_P}::DOUBLE AS p, {QSKETCH_K}::INT AS k, n_sampled,
       round(sq, 6) AS sketch_q, round(eq, 6) AS exact_q,
       round(abs(sq - eq), 6) AS abs_err
FROM arms
"""


CORPUS_QUERIES = {
    "quantile_sketch_audit": (q_quantile_sketch_audit, SQL_QUANTILE_SKETCH_AUDIT),
    "corpus_clean": (q_corpus_clean, SQL_CORPUS_CLEAN),
    "lang_id_trigram": (q_lang_id_trigram, _sql_lang_id_trigram()),
    "source_quality_threshold": (q_source_quality_threshold, SQL_SOURCE_QUALITY_THRESHOLD),
    "text_nfc_normalize": (q_text_nfc_normalize, SQL_TEXT_NFC_NORMALIZE),
    "domain_curation": (q_domain_curation, SQL_DOMAIN_CURATION),
    "corpus_curation_pipeline": (q_corpus_curation_pipeline, _sql_curation_pipeline()),
    "doc_contamination": (q_doc_contamination, SQL_DOC_CONTAMINATION),
    "source_mix_weights": (q_source_mix_weights, SQL_SOURCE_MIX_WEIGHTS),
    "source_mix_apply": (q_source_mix_apply, SQL_SOURCE_MIX_APPLY),
    "split_leakage_safe": (q_split_leakage_safe, SQL_SPLIT_LEAKAGE_SAFE),
    "hybrid_rrf_topk": (q_hybrid_rrf_topk, _hybrid_oracle()),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "topk_per_source": (q_topk_per_source, SQL_TOPK_PER_SOURCE),
    "text_repetition": (q_text_repetition, SQL_TEXT_REPETITION),
    "corpus_sample": (q_corpus_sample, SQL_CORPUS_SAMPLE),
    "doc_chunks": (q_doc_chunks, SQL_DOC_CHUNKS),
    "corpus_shuffle": (None, None),  # bound below (needs SHUFFLE_* consts)
}


# -----------------------------------------------------------------------------
# corpus_shuffle: seeded deterministic training-order shuffle
# -----------------------------------------------------------------------------

SHUFFLE_SEED = "ep0"
SHUFFLE_SHARDS = 64


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle for training order: each document gets a
    seeded char-fold shuffle key; documents are sharded by the key and
    ordered within shards — change ``SHUFFLE_SEED`` per epoch for a fresh
    permutation, same seed replays bit-for-bit.

    100 TB shape: NO global sort/window — the only window partitions by
    shard (corpus/SHUFFLE_SHARDS rows each, the training-shard files a
    writer would emit via repartitionByRange + sortWithinPartitions); the
    shuffle key is a 64-bit column expression, so the whole permutation is
    one keyed exchange."""
    from simsearch_spark.functions.text import char_fold_hash

    docs = load_table(spark, sf_dir, "documents")
    key = char_fold_hash(
        F.concat(F.lit(SHUFFLE_SEED), F.lit("|"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("shard").orderBy(F.col("shuffle_key").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", key.alias("shuffle_key"))
        .withColumn("shard", F.pmod(F.col("shuffle_key"), F.lit(SHUFFLE_SHARDS)).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos", "shuffle_key")
    )


SQL_CORPUS_SHUFFLE = f"""
WITH t AS (
  SELECT doc_id,
         {_charfold_sql(f"'{SHUFFLE_SEED}|' || doc_id::VARCHAR")} AS shuffle_key
  FROM documents
)
SELECT doc_id, (shuffle_key % {SHUFFLE_SHARDS})::INT AS shard,
       row_number() OVER (PARTITION BY shuffle_key % {SHUFFLE_SHARDS}
                          ORDER BY shuffle_key ASC, doc_id ASC)::INT AS pos,
       shuffle_key
FROM t
"""

CORPUS_QUERIES["corpus_shuffle"] = (q_corpus_shuffle, SQL_CORPUS_SHUFFLE)
