import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from simsearch_spark.session import get_spark
from simsearch_spark.sources.registry import load_table

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="prof-passage")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

def t(label, thunk, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); thunk(); best = min(best, time.perf_counter()-t0)
    print(f"{label:40s} {best:7.3f}s")

def noop(df): df.write.format("noop").mode("overwrite").save()

docs = load_table(spark, SF, "documents")
from simsearch_spark.operators.winnow import winnow_fingerprints, passage_removal
from simsearch_spark.queries.pipeline import WINNOW_K, WINNOW_W, PASSAGE_MIN_DF
k, w, min_df = WINNOW_K, WINNOW_W, PASSAGE_MIN_DF

t("winnow_fingerprints (kernel only)", lambda: noop(winnow_fingerprints(docs, "doc_id", "text", k, w)))

from simsearch_spark.functions.text import char_fold_hash
base = docs.where(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
toks = base.select(F.col("doc_id").alias("id"), F.split(F.col("text"), " ").alias("wlist"))
t("tok posexplode+count", lambda: noop(toks.select("id", F.posexplode("wlist").alias("idx","tok"))))
# clean-text rebuild + char_fold over full docs (no cuts) as upper bound of the HOF cost
tok_rows = toks.select("id", F.posexplode("wlist").alias("idx", "tok"))
clean = tok_rows.groupBy("id").agg(F.array_join(F.transform(F.array_sort(F.collect_list(F.struct("idx","tok"))), lambda x: x["tok"]), " ").alias("ct"))
t("rebuild clean_text (agg only)", lambda: noop(clean))
t("rebuild + char_fold_hash HOF", lambda: noop(clean.select("id", char_fold_hash(F.col("ct")).alias("h"))))
t("passage_removal full", lambda: noop(passage_removal(docs, "doc_id", "text", k, w, min_df)))

# curation pipeline components
from simsearch_spark.queries.corpus import q_corpus_clean
from simsearch_spark.queries.vocab import q_lm_perplexity
t("corpus_clean", lambda: noop(q_corpus_clean(spark, SF)))
t("lm_perplexity scores_only", lambda: noop(q_lm_perplexity(spark, SF, scores_only=True)))
from simsearch_spark.queries.corpus import q_corpus_curation_pipeline
t("curation pipeline full", lambda: len(q_corpus_curation_pipeline(spark, SF).collect()))
# vocab countDistinct separately
from simsearch_spark.functions.text import ws_tokens
d2 = docs.where(F.col("text").isNotNull())
t("vocab countDistinct", lambda: noop(d2.select(F.explode(ws_tokens(F.col("text"))).alias("tok")).agg(F.countDistinct("tok"))))
from simsearch_spark.queries.vocab import lm_doc_bigrams
t("lm_doc_bigrams", lambda: noop(lm_doc_bigrams(d2)))
spark.stop()
