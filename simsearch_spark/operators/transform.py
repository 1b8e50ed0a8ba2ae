"""Mount-time transformations (SURVEY.md §1.2):

- word2vec transform: keyword sets → dense vectors by averaging per-token
  embeddings from a mounted vector dictionary
  (``manager/ingested/lookup/Word2VectorTransformer.java:42-90``, wired at
  ``Coordinator.java:608-643``).
- z / unity normalization of numeric attributes before indexing
  (``ZNormal.java:23``, ``UnityNormal.java:25``, applied
  ``DataIngestor.java:243-254``; the query value is normalized with the same
  statistics — ``SearchHandler.java:455-461``).

Scale: the dictionary join broadcasts (vocabularies are small relative to
corpora); the element-wise mean shuffles (id, pos) pairs — at 100 TB this is
a mount-time batch job whose output is persisted next to the table, exactly
like the reference's transform-at-mount.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simsearch_spark.functions.measures import unity_normal, z_normal


def word2vec_transform(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    dictionary: DataFrame,
    term_col: str = "term",
    vec_col: str = "vec",
    flat: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Average the dictionary vectors of a row's tokens.

    Tokens missing from the dictionary contribute nothing (the reference
    skips unknown words, Word2VectorTransformer.java:66-78); rows with no
    known token produce no output row (reference leaves the entity out of
    the transformed dataset).

    Plan shape: one groupBy(id) carrying `dim` per-dimension ``avg``
    aggregates over the packed vector column.  Every aggregate combines
    map-side, so the shuffle moves one partial row per (id, map partition)
    — the earlier posexplode→groupBy(id, pos) layout multiplied the shuffle
    row count by `dim` (64× at the fixture schema; round-1 flagged it as
    avoidable amplification at corpus scale).  The flat (id, pos, avg_val)
    layout is reconstituted by posexplode AFTER aggregation, where only
    result rows pay it.

    flat=True returns (id, pos, avg_val) — the element-wise layout used by
    the DuckDB oracle; flat=False returns (id, vec) packed arrays.
    """
    if dim is None:
        # bounded driver scalar: vector width from one dictionary row
        first = dictionary.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            # empty dictionary: every token is unknown, so no entity gets a
            # vector — the documented skipped-word contract, not an error
            id_dtype = dict(df.dtypes)[id_col]
            schema = (
                f"{id_col} {id_dtype}, pos int, avg_val double"
                if flat
                else f"{id_col} {id_dtype}, vec array<double>"
            )
            return df.sparkSession.createDataFrame([], schema)
        dim = int(first.d)
    toks = df.select(F.col(id_col), F.explode(tokens_col).alias("token"))
    joined = toks.join(
        F.broadcast(dictionary.select(F.col(term_col).alias("token"), F.col(vec_col).alias("v"))),
        "token",
    )
    # round AFTER the flatten: one round expression on the exploded column
    # instead of `dim` round-wrapped aggregates — same values (round of the
    # finished avg either way), ~dim fewer expression instances to codegen
    aggs = [F.avg(F.col("v").getItem(i)).alias(f"_d{i}") for i in range(dim)]
    packed = joined.groupBy(id_col).agg(*aggs)
    vec = F.array(*[F.col(f"_d{i}") for i in range(dim)])
    if flat:
        return packed.select(F.col(id_col), F.posexplode(vec).alias("pos", "avg_val")).withColumn(
            "avg_val", F.round("avg_val", 6)
        )
    return packed.select(F.col(id_col), F.transform(vec, lambda x: F.round(x, 6)).alias("vec"))


def z_normalize(df: DataFrame, col: str, out: str | None = None) -> tuple[DataFrame, float, float]:
    """Attach a z-normalized column; returns (df, mean, std) so query values
    can be normalized with the same statistics (SearchHandler.java:455-461).
    Sample stddev (n-1) on both engines."""
    stats = df.agg(F.avg(col).alias("m"), F.stddev(col).alias("s")).first()
    mean, std = float(stats.m), float(stats.s or 0.0)
    return (
        df.withColumn(out or f"{col}_z", z_normal(F.col(col), F.lit(mean), F.lit(std))),
        mean,
        std,
    )


def unity_normalize(df: DataFrame, col: str, out: str | None = None) -> tuple[DataFrame, float, float]:
    """Attach a [0,1]-scaled column; returns (df, min, max)."""
    stats = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    lo, hi = float(stats.lo), float(stats.hi)
    return (
        df.withColumn(out or f"{col}_u", unity_normal(F.col(col), F.lit(lo), F.lit(hi))),
        lo,
        hi,
    )
