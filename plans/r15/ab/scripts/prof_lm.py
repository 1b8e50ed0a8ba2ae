import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from simsearch_spark.session import get_spark
from simsearch_spark.sources.registry import load_table
from simsearch_spark.queries.vocab import lm_doc_bigrams, _lm_scored_agg, lm_score_self_agg
from simsearch_spark.functions.text import ws_tokens

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="prof-lm")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

def t(label, thunk, n=4):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); thunk(); best = min(best, time.perf_counter()-t0)
    print(f"{label:44s} {best:7.3f}s")

def noop(df): df.write.format("noop").mode("overwrite").save()

docs = load_table(spark, SF, "documents").where(F.col("text").isNotNull())
bgc = lm_doc_bigrams(docs).persist()
bgc.count()
vocab = docs.select(F.explode(ws_tokens(F.col("text"))).alias("tok")).agg(F.countDistinct("tok").alias("v"))
print("bgc rows:", bgc.count())

t("current: 2-window scoring", lambda: noop(lm_score_self_agg(bgc, vocab)))

def one_exchange(bgc, vocab):
    enriched = (
        bgc.repartition("ctx")
        .withColumn("cb", F.sum("m").over(Window.partitionBy("ctx", "ngram")))
        .withColumn("cu", F.sum("m").over(Window.partitionBy("ctx")))
        .crossJoin(F.broadcast(vocab))
    )
    return _lm_scored_agg(enriched)

t("one-exchange ctx-partitioned scoring", lambda: noop(one_exchange(bgc, vocab)))

# equivalence check (bit-exact)
a = lm_score_self_agg(bgc, vocab).orderBy("doc_id").collect()
b = one_exchange(bgc, vocab).orderBy("doc_id").collect()
print("bit-identical:", a == b, "rows:", len(a))
# plan exchange counts
import io
for name, df in [("old", lm_score_self_agg(bgc, vocab)), ("new", one_exchange(bgc, vocab))]:
    s = df._jdf.queryExecution().explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    print(name, "Exchange count:", s.count("Exchange"), "Sort count:", s.count("Sort ("))
spark.stop()
