import sys, time, json
sys.path.insert(0, "/root/repo")
from simsearch_spark.session import get_spark
from simsearch_spark.queries import REGISTRY

SF = "/root/testdata/sf0.1"
names = sys.argv[1:]
spark = get_spark(app_name="minibench")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

def run(name):
    fn, _ = REGISTRY[name]
    t0 = time.perf_counter()
    n = len(fn(spark, SF).collect())
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt

res = {}
for name in names: run(name)          # cold
for rep in range(3):
    for name in names:
        res.setdefault(name, []).append(run(name))
base = json.load(open("/root/repo/plans/r15/ab/base1_detail.json"))["queries_min"]
tot_new = tot_old = 0.0
for name in names:
    m = min(res[name]); b = base.get(name)
    tot_new += m; tot_old += b or 0
    print(f"{name:28s} base={b} now={m:.3f} ratio={m/b if b else float('nan'):.3f}")
print(f"TOTAL base={tot_old:.2f} now={tot_new:.2f} ratio={tot_new/tot_old:.3f}")
spark.stop()
