"""In-JVM interleaved A/B of fanout_for_kernel at the four r14 text/langid
sites: alternate fanout-on / fanout-off (identity) per query, 6 reps each."""
import sys, time
sys.path.insert(0, "/root/repo")
from simsearch_spark.session import get_spark
from simsearch_spark.queries import REGISTRY
import simsearch_spark.functions.text as T
import simsearch_spark.functions.langid as L
from simsearch_spark.operators.fanout import fanout_for_kernel

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-fanout")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

ident = lambda df, key: df

QUERIES = ["text_lang_id", "text_nfc_normalize", "corpus_clean", "lang_id_trigram",
           "corpus_quality_filter"]

def run(name):
    fn, _ = REGISTRY[name]
    t0 = time.perf_counter()
    rows = len(fn(spark, SF).collect())
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt, rows

# warm both arms once
for name in QUERIES:
    for mode in (fanout_for_kernel, ident):
        T._fanout = mode; L._fanout = mode
        run(name)

res = {}
for name in QUERIES:
    on, off = [], []
    rows_on = rows_off = None
    for rep in range(6):
        T._fanout = fanout_for_kernel; L._fanout = fanout_for_kernel
        dt, rows_on = run(name); on.append(dt)
        T._fanout = ident; L._fanout = ident
        dt, rows_off = run(name); off.append(dt)
    assert rows_on == rows_off, name
    print(f"{name:26s} fanout_ON  min={min(on):.3f} med={sorted(on)[3]:.3f} | "
          f"OFF min={min(off):.3f} med={sorted(off)[3]:.3f} | off/on={min(off)/min(on):.3f}")
spark.stop()
