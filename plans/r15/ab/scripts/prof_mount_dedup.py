import sys, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from simsearch_spark.session import get_spark
from simsearch_spark.sources.registry import load_table
from simsearch_spark.mount.dedup import mount_dedup, dedup_append
from simsearch_spark.queries.pipeline import MINHASH_T, N_HASHES, N_BANDS, DEDUP_APPEND_MOD, DEDUP_APPEND_RESIDUE

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="prof-mount-dedup")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
docs = load_table(spark, SF, "documents")
is_delta = F.pmod(F.col("doc_id"), F.lit(DEDUP_APPEND_MOD)) == DEDUP_APPEND_RESIDUE
base, delta = docs.where(~is_delta), docs.where(is_delta)
print("base:", base.count(), "delta:", delta.count(), "bands:", N_BANDS)
for rep in range(3):
    d = tempfile.mkdtemp(prefix="mnt_")
    t0 = time.perf_counter()
    mount_dedup(spark, d, base, threshold=MINHASH_T, n_hashes=N_HASHES, bands=N_BANDS)
    t1 = time.perf_counter()
    rows = dedup_append(spark, d, delta, update=False).collect()
    t2 = time.perf_counter()
    print(f"mount_dedup={t1-t0:.3f}s dedup_append={t2-t1:.3f}s rows={len(rows)}")
    shutil.rmtree(d, ignore_errors=True)
    spark.catalog.clearCache()
import subprocess
spark.stop()
