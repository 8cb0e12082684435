"""Capture .explain('formatted') for named registry/bench queries.

Usage: REPO=/path python plans/r14/capture_plans.py <tag> q1 q2 ... (or ALL_TOUCHED)
Writes /root/repo/plans/r14/<query>_<tag>.txt from the code at $REPO
(default /root/repo). Explain only - no job execution.
"""
import sys, os, io, contextlib

TAG = sys.argv[1]
NAMES = sys.argv[2:]
TOUCHED = [
    "pipe_sim_semdedup_scaled_p2", "pipe_sim_semdedup_scaled",
    "pipe_sim_semdedup_autok", "pipe_sim_semdedup", "pipe_sim_kmeans",
    "pipe_dedup_clusters", "pipe_dedup_merge_increment",
    "pipe_curate_rank_mix", "pipe_dedup_sorted_neighborhood",
    "rel_bloom_prune_join", "pipe_source_ppr", "pipe_mm_dedup_keep",
]
if NAMES == ["ALL_TOUCHED"]:
    NAMES = TOUCHED

repo = os.environ.get("REPO", "/root/repo")
sys.path.insert(0, repo)
from yat_geo_db_spark.session import get_spark
from yat_geo_db_spark.queries import all_queries
sys.path.insert(0, repo)  # bench.py lives at repo root
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
    out = f"/root/repo/plans/r14/{name}_{TAG}.txt"
    with open(out, "w") as f:
        f.write(buf.getvalue())
    txt = buf.getvalue()
    print(f"{name}: Exchange={txt.count('Exchange')} SMJ={txt.count('SortMergeJoin')} "
          f"BHJ={txt.count('BroadcastHashJoin')} pyeval={txt.count('EvalPython')+txt.count('MapInPandas')+txt.count('ArrowEval')} lines={len(txt.splitlines())}")
spark.stop()
