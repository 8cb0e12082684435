"""Two-point scaling evidence for the heavy operator family.

Builds a 10x scale-up of the $SPARK_GRAFT_SF_DIR (default sf0.1)
`documents` and `embeddings` tables and measures the heavy headline
queries at BOTH sizes, printing one JSON line of per-query
{base_sec, scaled_sec, ratio}. The bar is <=~linear-in-input on a
fixed local[N] box (these are all equi-join/agg pipelines; a
superlinear ratio means a hidden candidate blow-up the sf0.1 bench and
the plan tests cannot see).

The scale-up is a union of SCALE deterministic variants, not raw
copies — each copy perturbs content so it contributes new distinct
work instead of exact duplicates:

- documents: per-copy word ROTATION of the text (same vocabulary,
  length and token distributions; different strings, different
  sort/blocking keys) + disjoint doc_id range per copy.
- embeddings: per-copy cyclic DIMENSION rotation of the vector (norms
  and pairwise-distance distribution preserved within a copy; copies
  land in different regions) + disjoint vec_id range per copy.

Both transforms are pure Column expressions — the fixture build is one
distributed pass per table. The `source` column is left as-is: its
cardinality is fixed by the upstream generator across scale factors
(20 at every sf), so the ppr/lpa graph is constant-size by design and
their scaling measures the distinct-scan, not graph growth — see
BENCHLOG.md for the per-query interpretation.

Usage:  python bench_scaling.py
Env:    SPARK_GRAFT_SF_DIR    base dir   (default /root/testdata/sf0.1)
        SPARK_GRAFT_SCALE_DIR fixture dir (default /tmp/sf_scaled_10x)
        SPARK_GRAFT_SCALE     copies      (default 10)
"""
from __future__ import annotations

import json
import os
import sys
import time

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sf_scaled_10x")
SCALE = int(os.environ.get("SPARK_GRAFT_SCALE", "10"))

#: the heavy family the round-8 verdict asked for, plus the autok
#: semdedup twin (the production auto-sized path — fixed-k semdedup is
#: quadratic-in-cell-size BY DESIGN and is pinned only for its oracle)
HEAVY = [
    "pipe_dedup_sorted_neighborhood",
    "pipe_sim_mmr",
    "pipe_graph_lpa",
    "pipe_source_ppr",
]

#: bench-only twins measured alongside HEAVY (appended in main)
EXTRA = ["pipe_sim_semdedup_autok", "pipe_sim_semdedup_scaled"]

_ID_STRIDE = 100_000_000


def build_fixture(spark) -> None:
    import pyspark.sql.functions as F

    from yat_geo_db_spark.testdata import load_table

    stamp = f"scale={SCALE} base={BASE_DIR}\n"
    marker = f"{SCALE_DIR}/_FIXTURE_OK"
    if os.path.exists(marker):
        # the marker records what the fixture IS — a changed
        # SPARK_GRAFT_SCALE/SF_DIR against the same dir must rebuild,
        # not silently measure stale data under a fresh label
        with open(marker) as fh:
            if fh.read() == stamp:
                return
        # stale stamp: drop it BEFORE rebuilding, so a crash mid-
        # rebuild can never leave the old stamp over half-new data
        os.remove(marker)
    docs = load_table(spark, BASE_DIR, "documents")
    emb = load_table(spark, BASE_DIR, "embeddings")

    def doc_copy(c: int):
        words = F.split(F.col("text"), " ")
        n = F.size(words)
        k = F.lit(c * 3) % F.greatest(n, F.lit(1))
        rotated = F.array_join(
            F.concat(
                F.slice(words, k + 1, n - k), F.slice(words, 1, k)
            ),
            " ",
        )
        return docs.select(
            (F.col("doc_id") + F.lit(c * _ID_STRIDE)).alias("doc_id"),
            (rotated if c else F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    def emb_copy(c: int):
        v = F.col("embedding")
        d = F.size(v)
        k = F.lit(c) % F.greatest(d, F.lit(1))
        rotated = F.concat(F.slice(v, k + 1, d - k), F.slice(v, 1, k))
        return emb.select(
            (F.col("vec_id") + F.lit(c * _ID_STRIDE)).alias("vec_id"),
            (rotated if c else v).alias("embedding"),
            "label",
        )

    all_docs = doc_copy(0)
    all_emb = emb_copy(0)
    for c in range(1, SCALE):
        all_docs = all_docs.unionByName(doc_copy(c))
        all_emb = all_emb.unionByName(emb_copy(c))
    all_docs.write.mode("overwrite").parquet(f"{SCALE_DIR}/documents.parquet")
    all_emb.write.mode("overwrite").parquet(f"{SCALE_DIR}/embeddings.parquet")
    with open(marker, "w") as fh:
        fh.write(stamp)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_query(spark, fn, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    return best


def main() -> None:
    from bench import BENCH_ONLY, _bench_session, _warm
    from yat_geo_db_spark.queries import all_queries

    spark = _bench_session()
    registry = all_queries()
    _warm(spark, registry)
    build_fixture(spark)

    names = HEAVY + EXTRA
    out = {}
    for name in names:
        fn = BENCH_ONLY.get(name) or registry[name][0]
        base = _time_query(spark, fn, BASE_DIR)
        scaled = _time_query(spark, fn, SCALE_DIR)
        out[name] = {
            "base_sec": round(base, 3),
            "scaled_sec": round(scaled, 3),
            "ratio": round(scaled / base, 2),
        }
        print(f"# {name}: {base:.2f}s -> {scaled:.2f}s "
              f"({scaled / base:.2f}x at {SCALE}x input)", file=sys.stderr)
    print(json.dumps({
        "metric": "scaling_ratio_10x",
        "scale": SCALE,
        "base": BASE_DIR,
        "queries": out,
    }))


if __name__ == "__main__":
    main()
