"""Hot-cell split scale probe (r14).

Measures the cost of the targeted ``split_cell`` repair against the
alternative it replaces — a full vector-family retrain — while the
OTHER cells' mass grows.  The split touches one cell's rows plus
O(metadata) hardlinks, so its wall-clock should track the HOT cell's
size, not the mount's; ``refresh_vector`` re-trains and re-encodes the
whole corpus, so it grows with the mount.

At each factor over $SPARK_GRAFT_SF_DIR (default sf0.1):
  1. mount the replicated corpus (vector family from the embeddings
     table; dedup off — the split never touches the text/dedup sides),
  2. append a FIXED-SIZE skewed delta (2,000 rows around one centroid)
     to manufacture the hot cell appends create in production,
  3. time ``split_cell`` of that cell vs ``refresh(families=['vector'])``.

Usage: python tools/split_probe.py [factors...]   (default: 1 10)
Prints one JSON line {factor: {stage: sec, ...}}.
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTORS = [int(a) for a in sys.argv[1:]] or [1, 10]
DELTA_ROWS = 2_000


def timed(fn):
    t0 = time.perf_counter()
    r = fn()
    return round(time.perf_counter() - t0, 3), r


def main() -> None:
    import numpy as np

    from simsearch_spark.mount import mount, refresh
    from simsearch_spark.mount.artifacts import load_centroid_map
    from simsearch_spark.mount.maintain import (
        append_rows,
        cell_sizes,
        merge_cells,
        split_cell,
    )
    from simsearch_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "scale_probe", os.path.join(os.path.dirname(__file__), "scale_probe.py")
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)

    spark = get_spark(app_name="split-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="simsearch_split_")
    out: dict[str, dict] = {}
    try:
        for f in FACTORS:
            sf = sp.replicate(root, f)
            d = os.path.join(sf, "_m")
            res: dict = {}
            t, _ = timed(lambda: mount(spark, sf, d, dedup=False))
            res["mount"] = t

            cmap = load_centroid_map(spark, d)
            hot_id = sorted(cmap)[0]
            rng = np.random.default_rng(14)
            base = np.array(cmap[hot_id], dtype=float)
            start = 10_000_000
            delta = spark.createDataFrame(
                [
                    (
                        start + i,
                        [float(round(x, 6)) for x in base + v],
                    )
                    for i, v in enumerate(
                        rng.normal(0.0, 0.01, (DELTA_ROWS, len(base)))
                    )
                ],
                "vec_id long, embedding array<double>",
            )
            t, _ = timed(lambda: append_rows(spark, d, emb_delta=delta))
            res["append_hot"] = t
            sizes = cell_sizes(spark, d)
            res["hot_rows"] = sizes[hot_id]
            res["corpus_rows"] = sum(sizes.values())

            t, rep = timed(
                lambda: split_cell(spark, d, cell_id=hot_id, min_rows=1)
            )
            assert rep["split"], rep
            res["split_cell"] = t

            # merge dual: fold the smaller child straight back — same
            # machinery in reverse, cost tracks the dust cell's rows
            small_child = min(rep["part_rows"], key=lambda c: rep["part_rows"][c])
            t, mrep = timed(
                lambda: merge_cells(spark, d, cell_ids=[small_child])
            )
            assert mrep["merged"], mrep
            res["merge_cells"] = t
            res["merged_rows"] = rep["part_rows"][small_child]

            # the honest alternative retrains over the CURRENT corpus
            # (source + the appended delta) — the refresh guard rejects a
            # shrinking frame by design
            from pyspark.sql import functions as F

            from simsearch_spark.sources.registry import load_table

            emb_full = load_table(spark, sf, "embeddings").unionByName(
                delta.withColumn("label", F.lit(int(hot_id)))
            )
            t, _ = timed(
                lambda: refresh(spark, d, families=["vector"], emb_frame=emb_full)
            )
            res["refresh_vector"] = t
            out[str(f)] = res
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
