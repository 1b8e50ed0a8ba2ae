"""Mounted-BPE encode scale probe (VERDICT r13 task 2) + pair-kernel
memory model check (task 4).

Part 1 — encode flatness: train the merge table ONCE (mount_bpe on the
base corpus), then time ``serve_bpe_encode`` over corpora at factors
1x/10x/30x.  The kernel is row-local (no shuffle), so wall-clock must
scale ~linearly in rows with a flat per-row cost — the tokenizer analog
of the codes-scan flatness probes.

Part 2 — kernel working set: tracemalloc peak of ``_score_pair_group``
on a (block_rows x dim) diagonal tile vs the 8*(4*br^2 + 2*br*dim)
model the ``_clamp_block_rows`` budget solves against — evidence the
clamp's model matches what the kernel actually allocates (the 128 GiB
sandbox would otherwise hide an OOM a 4 GiB executor hits).

Usage: python tools/bpe_probe.py [factors...]   (default: 1 10 30)
Prints one JSON line.
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

FACTORS = [int(a) for a in sys.argv[1:]] or [1, 10, 30]


def kernel_peak(block_rows: int, dim: int) -> dict:
    import tracemalloc

    import numpy as np
    import pandas as pd

    from simsearch_spark.operators.dedup import _score_pair_group

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(block_rows, dim))
    pdf = pd.DataFrame(
        {
            "rid": np.arange(block_rows, dtype=np.int64),
            "v": list(vecs),
            "nrm": np.sqrt((vecs * vecs).sum(axis=1)),
        }
    )
    tracemalloc.start()
    _score_pair_group(pdf, 0.99, diagonal=True)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    model = 8 * (4 * block_rows * block_rows + 2 * block_rows * dim)
    return {
        "block_rows": block_rows,
        "dim": dim,
        "peak_mb": round(peak / 1e6, 1),
        "model_mb": round(model / 1e6, 1),
        "ratio": round(peak / model, 2),
    }


def main() -> None:
    from simsearch_spark.mount.bpe import mount_bpe, serve_bpe_encode
    from simsearch_spark.session import get_spark
    from simsearch_spark.sources.registry import load_table

    spec = importlib.util.spec_from_file_location(
        "scale_probe", os.path.join(os.path.dirname(__file__), "scale_probe.py")
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)

    spark = get_spark(app_name="bpe-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="simsearch_bpe_probe_")
    out: dict = {"encode": {}, "kernel_peak": []}
    try:
        base_sf = sp.replicate(root, 1)
        d = os.path.join(root, "_m_bpe")
        docs1 = load_table(spark, base_sf, "documents")
        t0 = time.perf_counter()
        mount_bpe(spark, d, docs1)
        out["train_sec"] = round(time.perf_counter() - t0, 3)
        for f in FACTORS:
            sf = sp.replicate(root, f)
            docs = load_table(spark, sf, "documents")
            # warm the relation, then time the full encode scan
            n = docs.count()
            t0 = time.perf_counter()
            total = (
                serve_bpe_encode(spark, d, docs.select("doc_id", "text"))
                .selectExpr("sum(size(bpe_tokens)) as s")
                .first()["s"]
            )
            sec = round(time.perf_counter() - t0, 3)
            out["encode"][str(f)] = {
                "sec": sec,
                "rows": int(n),
                "sec_per_1k_rows": round(1000.0 * sec / max(n, 1), 4),
                "subwords": int(total),
            }
        for br, dim in [(1024, 64), (2048, 64), (2048, 1024)]:
            out["kernel_peak"].append(kernel_peak(br, dim))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
