"""Spatial scale path: grid-bucketed exact k-NN (K3 at 100 TB).

The reference walks an in-heap JTS STR-tree (``SpatialSimSearch.java:88-143``).
The Spark-native replacement for a corpus that doesn't fit one heap is a
*grid bucketing* of lon/lat into cells of side `cell_deg`, persisted as
partition columns.  A query then reads rings of cells around the query cell,
expanding until the k-th exact distance proves no unexplored cell can
contain a closer point:

    cells at Chebyshev ring index m >= r+1 lie at planar distance
    >= r * cell_deg from any point in the query cell,

so once ``kth_exact <= r * cell_deg`` the ring search is complete — exact,
not approximate (same contract as the pivot lower bound: pruning only).

Locally the cell predicate is a pushed parquet filter; on a cluster with the
table written ``partitionBy("cell_x", "cell_y")`` it is partition pruning —
a k-NN touches O(rings²) partitions of the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simsearch_spark.functions import measures


def with_grid_cells(df: DataFrame, lon_col: str, lat_col: str, cell_deg: float) -> DataFrame:
    """Attach integer grid-cell coordinates (floor(coord / cell)) — the
    mount-time bucketing step; persist/partition by these at scale.

    If the frame ALREADY carries cell_x/cell_y (a table written
    ``partitionBy("cell_x", "cell_y")`` and read back), they are reused
    untouched: recomputing them from lon/lat would shadow the partition
    columns with derived expressions and silence partition pruning — the
    whole point of the layout.  The stored cells are validated against
    ``cell_deg`` on one sample row — a silent mismatch would make grid_knn
    terminate its ring search early and return a WRONG k-NN, so it is a
    hard error, not a performance footnote.
    """
    if "cell_x" in df.columns and "cell_y" in df.columns:
        import math

        probe = (
            df.where(F.col(lon_col).isNotNull() & F.col(lat_col).isNotNull())
            .select(lon_col, lat_col, "cell_x", "cell_y")
            .first()
        )
        if probe is not None:
            want = (
                int(math.floor(probe[lon_col] / cell_deg)),
                int(math.floor(probe[lat_col] / cell_deg)),
            )
            got = (probe["cell_x"], probe["cell_y"])
            if want != got:
                raise ValueError(
                    f"stored grid cells {got} disagree with cell_deg={cell_deg} "
                    f"(expected {want} for lon/lat {probe[lon_col]}, {probe[lat_col]}); "
                    "pass the cell_deg the layout was written with"
                )
        return df
    return df.withColumn(
        "cell_x", F.floor(F.col(lon_col) / F.lit(float(cell_deg))).cast("int")
    ).withColumn("cell_y", F.floor(F.col(lat_col) / F.lit(float(cell_deg))).cast("int"))


def grid_knn(
    df: DataFrame,
    id_col: str,
    lon_col: str,
    lat_col: str,
    qlon: float,
    qlat: float,
    k: int,
    cell_deg: float = 1.0,
    max_rings: int = 64,
) -> DataFrame:
    """Exact planar-degrees k-NN via ring expansion over grid cells.

    Driver-side loop issues one job per expansion step (typically 1-3); each
    job's cell predicate reaches the scan (pushed filter locally, partition
    pruning when the table is partitioned by cell).  Falls back to a full
    scan after `max_rings` (degenerate data distributions).
    """
    import math

    gridded = with_grid_cells(df, lon_col, lat_col, cell_deg)
    qcx, qcy = int(math.floor(qlon / cell_deg)), int(math.floor(qlat / cell_deg))
    dist = measures.planar_distance(
        F.col(lon_col), F.col(lat_col), F.lit(float(qlon)), F.lit(float(qlat))
    )

    r = 1
    while r <= max_rings:
        ring_pred = (
            (F.col("cell_x") >= qcx - r) & (F.col("cell_x") <= qcx + r)
            & (F.col("cell_y") >= qcy - r) & (F.col("cell_y") <= qcy + r)
        )
        cand = (
            gridded.where(ring_pred)
            .where(F.col(lon_col).isNotNull() & F.col(lat_col).isNotNull())
            .withColumn("dist", dist)
            .orderBy(F.col("dist").asc(), F.col(id_col).asc())
            .limit(k)
        )
        rows = cand.collect()
        # strict <: an unexplored point at exactly r*cell could tie the k-th
        # and win the id tie-break — expand once more instead
        if len(rows) >= k and rows[k - 1]["dist"] < r * cell_deg:
            return cand.drop("cell_x", "cell_y")
        if len(rows) >= k and r == max_rings:
            break
        r *= 2

    # exhaustive fallback — still exact
    return (
        gridded.where(F.col(lon_col).isNotNull() & F.col(lat_col).isNotNull())
        .withColumn("dist", dist)
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("cell_x", "cell_y")
    )
