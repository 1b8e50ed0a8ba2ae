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


CORPUS_QUERIES = {
    "corpus_clean": (q_corpus_clean, SQL_CORPUS_CLEAN),
}
