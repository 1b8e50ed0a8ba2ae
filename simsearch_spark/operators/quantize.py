"""Scalar (int8) embedding quantization + reconstruction-error audit.

The vector-compression step of a 100 TB ANN deployment: a 64-dim float32
embedding is 256 bytes; uint8 codes are 64 — the 4× that decides whether a
shard's index fits executor memory (IVF+SQ8 is the standard recipe).  This
operator computes the per-dimension affine codebook (global min / scale
over the corpus), the uint8 codes, and the L2 reconstruction error each
vector would incur — the audit a pipeline runs before committing to
quantized retrieval.

Execution shape:
- codebook: one posexplode pass → groupBy(dim) min/max with map-side
  partial aggregation — output is dim rows, packed into two literal-sized
  arrays on a 1-row frame;
- encode/decode: the 1-row codebook frame is broadcast-crossJoined onto
  the corpus and evaluated per element in whole-stage codegen
  (``transform`` with index + ``element_at``) — the corpus never shuffles
  and never row-inflates on this pass.

Determinism contract for the oracle: min/max are order-exact, the affine
map is identical IEEE arithmetic on both engines, and the per-vector error
is rounded to 6 decimals before any cross-row aggregate, so the one
unordered float sum (err² over dims) is pinned well below the rounding
grain.  Constant dimensions (scale 0) decode to the minimum, mirrored by
the oracle's CASE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_LEVELS = 255  # uint8 code range 0..255


def quantization_error(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Return ``id_col`` + ``err`` (rounded L2 distance between each vector
    and its int8-quantized reconstruction) plus the original columns."""
    flat = df.select(F.posexplode(F.col(vec_col)).alias("pos", "v"))
    stats = flat.groupBy("pos").agg(
        F.min(F.col("v").cast("double")).alias("mn"),
        F.max(F.col("v").cast("double")).alias("mx"),
    )
    codebook = (
        stats.agg(F.array_sort(F.collect_list(F.struct("pos", "mn", "mx"))).alias("p"))
        .select(
            F.transform("p", lambda s: s["mn"]).alias("mins"),
            F.transform("p", lambda s: (s["mx"] - s["mn"]) / QUANT_LEVELS).alias("scales"),
        )
    )
    joined = df.crossJoin(F.broadcast(codebook))

    def dequant(x, i):
        mn = F.element_at(F.col("mins"), i + F.lit(1))
        sc = F.element_at(F.col("scales"), i + F.lit(1))
        code = F.least(
            F.greatest(F.round((x.cast("double") - mn) / sc, 0), F.lit(0.0)),
            F.lit(float(QUANT_LEVELS)),
        )
        return F.when(sc == 0, mn).otherwise(mn + code * sc)

    recon = F.transform(F.col(vec_col), dequant)
    sq = F.zip_with(
        F.col(vec_col), recon, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
    )
    err = F.round(F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)), 6)
    return joined.withColumn("err", err).drop("mins", "scales")
