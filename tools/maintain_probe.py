"""Maintenance scale probe (VERDICT r11 task 7): measure SERVE cost as a
mounted instance ages — tombstone mass grows, small appends fragment the
codes table — at corpus factors 1x/10x/30x, and verify compaction
restores the clean-mount cost.  The numbers behind the
``COMPACT_TOMBSTONE_FRACTION`` / ``COMPACT_FILES_PER_CELL`` trigger
constants (mount/maintain.py; discussion in SCALE.md §r12).

Usage: python tools/maintain_probe.py [factors...]   (default: 1 10 30)
Prints one JSON line:
  {factor: {clean, tomb10, tomb40, frag20, compacted}: {sec, ...}}
Each serve is warmed once and timed as the median of 3 runs (serve cost
is sub-second; scheduler jitter would otherwise dominate).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTORS = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
K, N_PROBE, RERANK = 10, 2, 30


def timed_serve(spark, d, emb, qvec):
    from simsearch_spark.mount.serve import serve_ivfpq_topk

    def once():
        t0 = time.perf_counter()
        rows = serve_ivfpq_topk(
            spark, d, emb, qvec, K, n_probe=N_PROBE, rerank=RERANK
        ).collect()
        assert len(rows) == K
        return time.perf_counter() - t0

    once()  # warm
    return round(statistics.median(once() for _ in range(3)), 3)


def main() -> None:
    from pyspark.sql import functions as F

    from simsearch_spark.mount import append_rows, delete_ids, mount
    from simsearch_spark.mount.maintain import (
        compact_codes,
        maintenance_stats,
        should_compact,
    )
    from simsearch_spark.session import get_spark
    from simsearch_spark.sources.registry import load_table

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scale_probe", os.path.join(os.path.dirname(__file__), "scale_probe.py")
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)

    spark = get_spark(app_name="maintain-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="simsearch_maintain_")
    out: dict[str, dict] = {}
    try:
        for f in FACTORS:
            sf = sp.replicate(root, f)
            emb = load_table(spark, sf, "embeddings").persist()
            n = emb.count()
            d = os.path.join(sf, "_m")
            mount(spark, "", d, emb_frame=emb, docs_frame=_docs_stub(spark), dedup=False)
            qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
            res: dict[str, dict] = {}
            res["clean"] = {"sec": timed_serve(spark, d, emb, qvec)}

            # drift audit with the bounded brute arm (r13): cost must be
            # ~flat in corpus size — the serve arm is cell-pruned and the
            # ground-truth arm is the fixed-size hash sample ∪ served ids
            from simsearch_spark.mount import audit_drift

            audit_drift(spark, d, emb, sample_n=16, k=K, n_probe=N_PROBE,
                        rerank=RERANK, corpus_sample_n=512)  # warm
            t0 = time.perf_counter()
            a = audit_drift(spark, d, emb, sample_n=16, k=K, n_probe=N_PROBE,
                            rerank=RERANK, corpus_sample_n=512)
            res["audit_sampled"] = {
                "sec": round(time.perf_counter() - t0, 3),
                "recall": a["recall_at_k"],
            }

            ids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").collect()]
            # tombstone 10 %, then the UNION of every-10th and every-3rd id
            # (= 40 % total — spread across cells, the realistic shape)
            delete_ids(spark, d, ids[:: 10])
            s = maintenance_stats(spark, d)
            res["tomb10"] = {
                "sec": timed_serve(spark, d, emb, qvec),
                "tombstone_fraction": round(s["tombstone_fraction"], 3),
                "should_compact": should_compact(spark, d),
            }
            delete_ids(spark, d, ids[:: 3])
            s = maintenance_stats(spark, d)
            res["tomb40"] = {
                "sec": timed_serve(spark, d, emb, qvec),
                "tombstone_fraction": round(s["tombstone_fraction"], 3),
                "should_compact": should_compact(spark, d),
            }

            # fragment: 20 small appends (fresh ids, assigned to frozen
            # cells) — every append adds a file per touched cell
            base_max = int(max(ids)) + 1
            for a in range(20):
                delta = (
                    emb.orderBy("vec_id")
                    .limit(50)
                    .select(
                        (F.col("vec_id") + base_max + a * 50).alias("vec_id"),
                        "embedding",
                    )
                )
                append_rows(spark, d, emb_delta=delta)
            s = maintenance_stats(spark, d)
            res["frag20"] = {
                "sec": timed_serve(spark, d, emb, qvec),
                "max_files_per_cell": s["max_files_per_cell"],
                "should_compact": should_compact(spark, d),
            }

            reclaimed = compact_codes(spark, d)
            s = maintenance_stats(spark, d)
            res["compacted"] = {
                "sec": timed_serve(spark, d, emb, qvec),
                "reclaimed": reclaimed,
                "max_files_per_cell": s["max_files_per_cell"],
                "should_compact": should_compact(spark, d),
            }
            res["n_vectors"] = n
            out[str(f)] = res
            emb.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


def _docs_stub(spark):
    """A minimal docs frame so mount()'s text artifacts stay tiny — the
    probe measures the VECTOR maintenance path."""
    return spark.createDataFrame(
        [(i, f"tiny document {i}") for i in range(10)], "doc_id long, text string"
    )


if __name__ == "__main__":
    main()
