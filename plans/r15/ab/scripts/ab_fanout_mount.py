"""Interleaved A/B: mount_dedup + dedup_append with default fan-outs
(N_BKT=32, N_SBKT=256) vs small fan-outs (8/16), monkeypatched, same JVM."""
import sys, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from simsearch_spark.session import get_spark
from simsearch_spark.sources.registry import load_table
import simsearch_spark.mount.dedup as md
from simsearch_spark.queries.pipeline import MINHASH_T, N_HASHES, N_BANDS, DEDUP_APPEND_MOD, DEDUP_APPEND_RESIDUE

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-mount-fanout")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
docs = load_table(spark, SF, "documents")
is_delta = F.pmod(F.col("doc_id"), F.lit(DEDUP_APPEND_MOD)) == DEDUP_APPEND_RESIDUE
base, delta = docs.where(~is_delta), docs.where(is_delta)

def once(n_bkt, n_sbkt):
    md.N_BKT, md.N_SBKT = n_bkt, n_sbkt
    d = tempfile.mkdtemp(prefix="mnt_")
    t0 = time.perf_counter()
    md.mount_dedup(spark, d, base, threshold=MINHASH_T, n_hashes=N_HASHES, bands=N_BANDS)
    t1 = time.perf_counter()
    rows = sorted((r.id_a, r.id_b) for r in md.dedup_append(spark, d, delta, update=False).collect())
    t2 = time.perf_counter()
    shutil.rmtree(d, ignore_errors=True)
    spark.catalog.clearCache()
    return t1-t0, t2-t1, rows

ARMS = {"default(32/256)": (32, 256), "small(8/16)": (8, 16)}
for a, (b, s) in ARMS.items(): once(b, s)   # warm
res = {a: [] for a in ARMS}; pairs = {}
for rep in range(4):
    for a, (b, s) in ARMS.items():
        m, ap, rows = once(b, s)
        res[a].append((m, ap)); pairs[a] = rows
assert pairs["default(32/256)"] == pairs["small(8/16)"], "RESULTS DIFFER"
print("results identical across fan-outs:", len(pairs["small(8/16)"]), "pairs")
for a in ARMS:
    ms = sorted(x[0] for x in res[a]); aps = sorted(x[1] for x in res[a])
    print(f"{a:18s} mount min={ms[0]:.3f} med={ms[1]:.3f} | append min={aps[0]:.3f} med={aps[1]:.3f}")
spark.stop()
