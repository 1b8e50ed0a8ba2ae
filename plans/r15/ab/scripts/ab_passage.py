"""Interleaved in-JVM A/B: old passage_removal (rebuild every doc) vs new
(rebuild cut docs only), identical-results asserted."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from simsearch_spark.session import get_spark
from simsearch_spark.sources.registry import load_table
from simsearch_spark.operators.winnow import winnow_fingerprints, passage_removal
from simsearch_spark.functions.text import char_fold_hash
from simsearch_spark.queries.pipeline import WINNOW_K, WINNOW_W, PASSAGE_MIN_DF

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-passage")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
docs = load_table(spark, SF, "documents")
k, w, min_df = WINNOW_K, WINNOW_W, PASSAGE_MIN_DF
id_col, text_col = "doc_id", "text"

def old_passage_removal():
    fps = winnow_fingerprints(docs, id_col, text_col, k, w).persist()
    base = docs.where(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
    toks = base.select(F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("wlist"))
    nt = toks.select("id", F.size("wlist").alias("n_tokens"))
    shared = (fps.groupBy("fp").agg(F.countDistinct(id_col).alias("df"), F.min(id_col).alias("winner"))
              .where(F.col("df") >= min_df))
    cuts = fps.join(shared, "fp").where(F.col(id_col) != F.col("winner")).select(F.col(id_col).alias("id"), "pos")
    cov = (cuts.select("id", F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias("idx"))
           .join(nt, "id").where(F.col("idx") < F.col("n_tokens")).select("id", "idx").distinct().persist())
    wspec = Window.partitionBy("id").orderBy("idx")
    spans = (cov.withColumn("prev", F.lag("idx").over(wspec))
             .withColumn("start", (F.col("prev").isNull() | (F.col("idx") - F.col("prev") != 1)).cast("long"))
             .groupBy("id").agg(F.sum("start").alias("n_spans"), F.count(F.lit(1)).alias("n_removed")))
    tok_rows = toks.select("id", F.posexplode("wlist").alias("idx", "tok"))
    kept = tok_rows.join(cov, ["id", "idx"], "left_anti")
    clean = kept.groupBy("id").agg(
        F.array_join(F.transform(F.array_sort(F.collect_list(F.struct("idx", "tok"))), lambda x: x["tok"]), " ").alias("clean_text"))
    return (nt.join(spans, "id", "left").join(clean, "id", "left")
            .select(F.col("id").alias(id_col), F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.coalesce(F.col("n_removed"), F.lit(0)).cast("long").alias("n_removed"),
                    (F.col("n_tokens") - F.coalesce(F.col("n_removed"), F.lit(0))).cast("long").alias("n_kept"),
                    F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
                    char_fold_hash(F.coalesce(F.col("clean_text"), F.lit(""))).alias("clean_hash")))

def new_passage_removal():
    return passage_removal(docs, id_col, text_col, k, w, min_df)

def run(mk):
    t0 = time.perf_counter()
    rows = sorted(tuple(r) for r in mk().collect())
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt, rows

run(old_passage_removal); run(new_passage_removal)  # warm
res = {"old": [], "new": []}; rows = {}
for rep in range(5):
    for a, mk in (("old", old_passage_removal), ("new", new_passage_removal)):
        dt, r = run(mk); res[a].append(dt); rows[a] = r
print("identical:", rows["old"] == rows["new"], "n:", len(rows["new"]))
for a in res:
    s = sorted(res[a]); print(f"{a}: min={s[0]:.3f} med={s[2]:.3f}")
spark.stop()
