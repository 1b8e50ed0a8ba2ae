"""In-JVM interleaved A/B: AQE parallelismFirst=true (default, favors tiny
partitions ~= cores) vs false (respects 64MB advisory -> fewer, larger
post-shuffle partitions).  AQE confs are read per-query, so both arms run
in ONE session, alternating."""
import sys, time
sys.path.insert(0, "/root/repo")
from simsearch_spark.session import get_spark
from simsearch_spark.queries import REGISTRY

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-aqe")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
KEY = "spark.sql.adaptive.coalescePartitions.parallelismFirst"

QUERIES = ["dedup_ngram_jaccard", "passage_removal", "split_leakage_safe",
           "corpus_shuffle", "media_pixel_stats", "corpus_curation_pipeline",
           "winnow_overlap", "tfidf_keywords", "lm_perplexity",
           "ann_ivfpq_topk", "media_shot_boundaries", "stream_dedup_docs",
           "semdedup", "embed_kmeans", "doc_contamination"]

def run(name):
    fn, _ = REGISTRY[name]
    t0 = time.perf_counter()
    rows = len(fn(spark, SF).collect())
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt, rows

for name in QUERIES:
    for v in ("true", "false"):
        spark.conf.set(KEY, v); run(name)   # warm both arms

tot = {"true": 0.0, "false": 0.0}
for name in QUERIES:
    res = {"true": [], "false": []}
    rows = {}
    for rep in range(4):
        for v in ("true", "false"):
            spark.conf.set(KEY, v)
            dt, r = run(name); res[v].append(dt); rows[v] = r
    assert rows["true"] == rows["false"], name
    mt, mf = min(res["true"]), min(res["false"])
    tot["true"] += mt; tot["false"] += mf
    print(f"{name:28s} pfirst=true min={mt:.3f} med={sorted(res['true'])[2]:.3f} | "
          f"false min={mf:.3f} med={sorted(res['false'])[2]:.3f} | false/true={mf/mt:.3f}")
print(f"TOTALS true={tot['true']:.2f} false={tot['false']:.2f} ratio={tot['false']/tot['true']:.3f}")
spark.stop()
