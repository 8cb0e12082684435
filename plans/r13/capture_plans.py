"""Capture .explain('formatted') for named registry/bench queries.

Usage: python plans/r13/capture_plans.py before q1 q2 ...  (or 'ALL_HEAVY')
Writes plans/r13/<query>_<tag>.txt. Explain only - no job execution.
"""
import sys, os, io, contextlib

TAG = sys.argv[1]
NAMES = sys.argv[2:]
HEAVY = [
    "pipe_dedup_clusters", "pipe_sim_semdedup", "pipe_sim_semdedup_scaled_p2",
    "pipe_dedup_sorted_neighborhood", "pipe_mm_dedup_keep", "pipe_sim_mmr",
    "pipe_graph_lpa", "pipe_source_ppr", "pipe_source_pagerank",
    "pipe_curate_rank_mix", "pipe_sim_kmeans", "pipe_graph_triangles",
    "pipe_dedup_simhash", "geo_fuzzy_city", "rel_bloom_prune_join",
    "pipe_dedup_merge_increment", "pipe_quality_logreg", "pipe_sketch_kmv_overlap",
]
if NAMES == ["ALL_HEAVY"]:
    NAMES = HEAVY

sys.path.insert(0, "/root/repo")
from yat_geo_db_spark.session import get_spark
from yat_geo_db_spark.queries import all_queries
import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="plan_capture")
spark.sparkContext.setLogLevel("ERROR")
registry = all_queries()
for name in NAMES:
    fn = bench.BENCH_ONLY[name] if name in bench.BENCH_ONLY else registry[name][0]
    df = fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out = f"/root/repo/plans/r13/{name}_{TAG}.txt"
    with open(out, "w") as f:
        f.write(buf.getvalue())
    txt = buf.getvalue()
    print(f"{name}: Exchange={txt.count('Exchange')} SMJ={txt.count('SortMergeJoin')} "
          f"BHJ={txt.count('BroadcastHashJoin')} pyeval={txt.count('EvalPython')+txt.count('MapInPandas')+txt.count('ArrowEval')}")
spark.stop()
