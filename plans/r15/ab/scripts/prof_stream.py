import sys, time, shutil
sys.path.insert(0, "/root/repo")
from simsearch_spark.session import get_spark
from simsearch_spark.queries import streaming as S

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="prof-stream")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

# staging cost alone
for i in range(3):
    t0 = time.perf_counter()
    d = S._staged_time_slices(SF, "events", n_slices=3)
    print(f"staged_time_slices: {time.perf_counter()-t0:.3f}s")
    shutil.rmtree(d, ignore_errors=True)
for i in range(2):
    t0 = time.perf_counter()
    d = S._staged_table(SF, "events")
    print(f"staged_table copy: {time.perf_counter()-t0:.3f}s")
    shutil.rmtree(d, ignore_errors=True)
# full query
for i in range(3):
    t0 = time.perf_counter()
    df = S.q_stream_asof_click(spark, SF)
    n = len(df.collect())
    print(f"q_stream_asof_click total: {time.perf_counter()-t0:.3f}s rows={n}")
for i in range(2):
    t0 = time.perf_counter()
    df = S.q_stream_sessionize(spark, SF)
    n = len(df.collect())
    print(f"q_stream_sessionize total: {time.perf_counter()-t0:.3f}s rows={n}")
spark.stop()
