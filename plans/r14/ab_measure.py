"""Paired A/B helper: one fresh session, warmup, then min-of-N per query
with clearCache between runs. Prints one JSON line {name: min_sec}.
Usage: python plans/r14/ab_measure.py q1,q2,... [runs]
"""
import sys, os, json, time
sys.path.insert(0, "/root/repo")
names = sys.argv[1].split(",")
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
import bench
from yat_geo_db_spark.queries import all_queries
from yat_geo_db_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab_measure")
spark.sparkContext.setLogLevel("ERROR")
registry = all_queries()
bench._warm(spark, registry)
out = {}
for name in names:
    fn = bench.BENCH_ONLY[name] if name in bench.BENCH_ONLY else registry[name][0]
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        bench.force(fn(spark, SF))
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    out[name] = round(best, 3)
print(json.dumps(out))
