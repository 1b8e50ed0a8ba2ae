import sys, time
sys.path.insert(0, "/root/repo")
from simsearch_spark.session import get_spark
from simsearch_spark.queries import streaming as S

SF = "/root/testdata/sf0.1"
n = int(sys.argv[1])
spark = get_spark(app_name=f"prof-stream-{n}", shuffle_partitions=n)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
for q, reps in [("q_stream_asof_click",3), ("q_stream_sessionize",2), ("q_stream_dedup_docs",2), ("q_stream_events_hourly",2), ("q_stream_enrich_hourly",2)]:
    best=1e9
    for i in range(reps):
        t0 = time.perf_counter()
        df = getattr(S, q)(spark, SF)
        rows = len(df.collect())
        best=min(best, time.perf_counter()-t0)
    print(f"{q:28s} parts={n:3d} best={best:.3f}s rows={rows}")
spark.stop()
