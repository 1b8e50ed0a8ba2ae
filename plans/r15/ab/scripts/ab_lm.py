"""3-arm in-JVM A/B of the LM scoring shape, interleaved:
A = r14: two-window scoring, per-consumer tokenize, bgc.persist
B = one-exchange window, per-consumer tokenize, bgc.persist
C = one-exchange window, shared toked.persist, no bgc persist (r15 tree)
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from simsearch_spark.session import get_spark
from simsearch_spark.sources.registry import load_table
from simsearch_spark.functions.text import ws_tokens
from simsearch_spark.operators.fanout import fanout_for_kernel
from simsearch_spark.operators.quantile import exact_quantile_cont
import simsearch_spark.queries.vocab as V

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-lm")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

def score_two_window(bgc, vocab):
    enriched = (bgc.withColumn("cb", F.sum("m").over(Window.partitionBy("ngram")))
                   .withColumn("cu", F.sum("m").over(Window.partitionBy("ctx")))
                   .crossJoin(F.broadcast(vocab)))
    return V._lm_scored_agg(enriched)

def score_one_exchange(bgc, vocab):
    enriched = (bgc.repartition("ctx")
                   .withColumn("cb", F.sum("m").over(Window.partitionBy("ctx", "ngram")))
                   .withColumn("cu", F.sum("m").over(Window.partitionBy("ctx")))
                   .crossJoin(F.broadcast(vocab)))
    return V._lm_scored_agg(enriched)

def lm(arm, scores_only=False):
    docs = load_table(spark, SF, "documents").where(F.col("text").isNotNull())
    if arm == "C":
        toked = (fanout_for_kernel(docs, "doc_id")
                 .select("doc_id", ws_tokens(F.col("text")).alias("toks")).persist())
        bgc = V.bigrams_from_tokens(toked)
        vocab = toked.select(F.explode("toks").alias("tok")).agg(F.countDistinct("tok").alias("v"))
        score = score_one_exchange
    else:
        bgc = V.lm_doc_bigrams(docs).persist()
        vocab = docs.select(F.explode(ws_tokens(F.col("text"))).alias("tok")).agg(F.countDistinct("tok").alias("v"))
        score = score_two_window if arm == "A" else score_one_exchange
    agg = score(bgc, vocab)
    if scores_only:
        return agg
    return V._lm_join_docs(docs, agg)

def quality_filter(arm):
    scored = lm(arm).persist()
    t_raw = exact_quantile_cont(scored, "log_ppl", V.LM_QUALITY_P)
    thr = spark.range(1).select(F.round(F.lit(t_raw).cast("double"), 6).alias("t"))
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id", "n_bigrams", "log_ppl",
        F.when(F.col("log_ppl").isNull(), F.lit("drop_unscored"))
         .when(F.col("log_ppl") > F.col("t"), F.lit("drop_tail"))
         .otherwise(F.lit("keep")).alias("bucket"))

def run(thunk):
    t0 = time.perf_counter()
    n = len(thunk().collect())
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt, n

ARMS = ["A", "B", "C"]
for q, mk in [("lm_perplexity", lambda a: lm(a)), ("quality_filter", quality_filter)]:
    for a in ARMS: run(lambda: mk(a))   # warm
    res = {a: [] for a in ARMS}; rows = {}
    for rep in range(5):
        for a in ARMS:
            dt, n = run(lambda: mk(a)); res[a].append(dt); rows[a] = n
    assert len(set(rows.values())) == 1, rows
    line = f"{q:16s} " + " | ".join(
        f"{a}: min={min(res[a]):.3f} med={sorted(res[a])[2]:.3f}" for a in ARMS)
    print(line)
spark.stop()
