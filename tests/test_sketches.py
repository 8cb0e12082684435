"""Sketch aggregates (rel_approx_stats) have no SQL hash oracle — HLL++ and
KLL/GK results are algorithm-specific — so bound them against exact answers."""

from __future__ import annotations

import pyspark.sql.functions as F

from yat_geo_db_spark.queries.relational_queries import approx_stats
from yat_geo_db_spark.testdata import load_table

SF = "/root/testdata/sf0.01"


def test_approx_stats_within_tolerance(spark):
    got = {r["event_type"]: r for r in approx_stats(spark, SF).collect()}

    events = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("vp"),
        )
        .collect()
    }
    assert got.keys() == exact.keys() and len(got) > 0
    for et, e in exact.items():
        g = got[et]
        # HLL++ at default rsd=5% is deterministic on fixed data;
        # measured error at sf0.01 is 0.67% per type (VERDICT r9 task
        # 7: tightened from the old 15% ceiling, 3x headroom kept)
        assert abs(g["approx_users"] - e["users"]) <= max(2, 0.02 * e["users"])
        # percentile_approx with accuracy=10000 on ~thousands of rows is
        # near-exact; exact interpolates between points, so allow a
        # neighbor gap (measured: p50 within 0.03, p95 within 0.80)
        assert abs(g["p50"] - e["vp"][0]) < 0.1
        assert abs(g["p95"] - e["vp"][1]) < 1.0


def test_stratified_sample_reproducible_and_rate_accurate(spark):
    from yat_geo_db_spark.pipelines.text import stratified_sample

    docs = load_table(spark, SF, "documents")
    rates = {"en": 0.5, "de": 1.0, "fr": 0.25, "es": 0.25}
    a = sorted(r["doc_id"] for r in stratified_sample(docs, rates).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(docs, rates).collect())
    assert a == b and len(a) > 0  # pure function of the key → identical runs

    by_lang = {
        r["lang"]: r["n"]
        for r in stratified_sample(docs, rates)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "zh" not in by_lang                  # absent stratum dropped
    assert by_lang["de"] == totals["de"]        # rate 1.0 keeps everything
    frac_en = by_lang["en"] / totals["en"]
    assert 0.3 < frac_en < 0.7                  # hash-uniformity sanity


def test_hll_mergeable_rollup_accuracy(spark):
    """Unioned per-day sketches must estimate per-type distinct users
    within HLL error bounds of the exact answer, and match a direct
    (no-rollup) sketch of the same data — mergeability is the property
    that makes sketch tables re-aggregable at any grain."""
    from yat_geo_db_spark.queries.relational_queries import hll_mergeable_rollup

    got = {
        r["event_type"]: r["approx_users"]
        for r in hll_mergeable_rollup(spark, SF).collect()
    }
    events = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    direct = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n"))
        .collect()
    }
    for t, n in exact.items():
        # default lgK=12: ~1.6% rse; measured at sf0.01 the estimate is
        # EXACT per type (150 distinct users ≪ 2^12 registers) — keep a
        # 2% band so a testdata regeneration cannot flake it
        assert abs(got[t] - n) / n < 0.02
        assert got[t] == direct[t]                 # rollup ≡ direct sketch


def test_cms_rollup_bounds_and_merge_equivalence(spark):
    """Count-min guarantees: merged-daily estimates are >= exact counts
    and <= exact + eps*N; merging daily sketches equals sketching the
    whole table directly (same seed)."""
    from yat_geo_db_spark.queries.relational_queries import cms_heavy_hitters
    from yat_geo_db_spark.testdata import load_table
    import pyspark.sql.functions as F

    sf = SF  # sf0.01 — the driver's correctness grain (r9 task 7)
    out = {r["event_type"]: r["approx_count"]
           for r in cms_heavy_hitters(spark, sf).collect()}
    events = load_table(spark, sf, "events")
    exact = {r["event_type"]: r["n"]
             for r in events.groupBy("event_type").agg(
                 F.count(F.lit(1)).alias("n")).collect()}
    n_total = sum(exact.values())
    for t, e in exact.items():
        assert out[t] >= e, (t, out[t], e)
        assert out[t] <= e + 0.001 * n_total + 1, (t, out[t], e)
        # measured at sf0.01: zero collision slack (5 probe keys in a
        # width-2719 sketch) — pin a tight band on top of the formal
        # eps*N guarantee so a width/seed regression is loud
        assert out[t] <= e + 5, (t, out[t], e)

    # merge-of-daily == whole-table sketch (same seed/params)
    whole = events.agg(
        F.expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").alias("sk")
    ).first()["sk"]
    jvm = spark._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(whole))
    for t in exact:
        assert out[t] == int(sk.estimateCount(t)), t


def test_histogram_quantile_state_merge_and_bounds(spark):
    """The histogram quantile leg of the rollup family: (1) merged
    per-batch states equal the one-shot histogram exactly (integer
    counts), (2) estimates from the merged state sit within one bin
    width of the exact quantile, (3) out-of-domain values clamp into
    edge bins instead of vanishing, (4) q=1.0 lands in the last
    occupied bin."""
    import random

    import pyspark.sql.functions as F

    from yat_geo_db_spark.relational.merge import (
        histogram_state, merge_histogram_states, quantile_from_histogram,
    )

    rng = random.Random(5)
    rows = [(i % 3, round(rng.uniform(0, 1000), 2)) for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, v double")
    lo, hi, bins = 0.0, 1000.0, 100
    width = (hi - lo) / bins

    # (1) merge associativity
    cls = (F.col("v") * 100).cast("long") % 4
    parts = [df.filter(cls <= 1), df.filter(cls == 2), df.filter(cls == 3)]
    states = [histogram_state(p, ["k"], "v", lo, hi, bins) for p in parts]
    merged = merge_histogram_states(states, ["k"])
    oneshot = histogram_state(df, ["k"], "v", lo, hi, bins)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, oneshot.collect())
    )

    # (2) accuracy bound vs exact quantiles
    qs = [0.1, 0.5, 0.9, 1.0]
    est = {
        (r["k"], r["q"]): r["quantile_est"]
        for r in quantile_from_histogram(
            merged, ["k"], qs, lo, hi, bins
        ).collect()
    }
    for k in range(3):
        vals = sorted(v for kk, v in rows if kk == k)
        for q in qs:
            exact = vals[min(len(vals) - 1, int(q * len(vals)))]
            assert abs(est[(k, q)] - exact) <= width + 1e-9, (k, q)
    assert est[(0, 1.0)] <= hi

    # (3) clamping: values beyond the declared domain survive in edge
    # bins, and NULL measurements are EXCLUDED (not bin-0 artifacts)
    wild = spark.createDataFrame(
        [(0, -50.0), (0, 2000.0), (0, 500.0), (0, None)],
        "k long, v double",
    )
    hs = histogram_state(wild, ["k"], "v", lo, hi, bins)
    got = {r["bin"]: r["n"] for r in hs.collect()}
    assert got == {0: 1, bins - 1: 1, 50: 1}
    assert sum(got.values()) == 3


# --------------------------------------------------------------------------
# KMV (k-minimum-values) — the oracle-replayable member of the family
# --------------------------------------------------------------------------

def _kmv_docs(spark, n_distinct, copies=2, group="a"):
    rows = [(group, f"v{i:06d}") for i in range(n_distinct)] * copies
    return spark.createDataFrame(rows, "g string, v string")


def test_kmv_exact_when_under_k(spark):
    """A group with fewer than k distinct values keeps its WHOLE set in
    the sketch — the estimate must be the exact count, flagged kept<k."""
    from yat_geo_db_spark.pipelines import sketch

    df = _kmv_docs(spark, 17, copies=3)
    out = sketch.kmv_distinct_estimate(df, "v", k=64, group_cols=("g",))
    row = out.collect()[0]
    assert row["kept"] == 17
    assert row["est_distinct"] == 17.0
    assert row["sketch_k"] == 64


def test_kmv_estimator_accuracy_both_hash_widths(spark):
    """n=5000 distinct values, k=64 → RSE ≈ 1/√62 ≈ 12.7%; assert the
    one deterministic draw lands within ±4 RSE on BOTH the 30-bit
    oracle-replayable fold and the 62-bit xxhash64 domain (the scramble
    argument — no avalanche in the poly hash — is what this pins)."""
    from yat_geo_db_spark.pipelines import sketch

    n = 5000
    df = _kmv_docs(spark, n)
    for hash_col, rng in (
        (None, None),  # defaults: kmv_hash_col / FNV_MOD
        (sketch.kmv_hash64_col(F.col("v")), sketch.KMV_HASH64_RANGE),
    ):
        kw = {} if hash_col is None else {
            "hash_col": hash_col, "hash_range": rng,
        }
        row = sketch.kmv_distinct_estimate(
            df, "v", k=64, group_cols=("g",), **kw
        ).collect()[0]
        assert row["kept"] == 64
        assert abs(row["est_distinct"] - n) / n < 0.51, row


def test_kmv_merge_identity(spark):
    """kmin_k(∪ shards) from the per-shard sketches alone must EQUAL the
    sketch of the unioned data — the mergeable property as set identity,
    not an error bound (this is what the registry's merge row hashes)."""
    from yat_geo_db_spark.pipelines import sketch

    shards = [
        _kmv_docs(spark, 900, group=g).withColumn(
            "v", F.concat(F.lit(g), F.col("v"))
        )
        for g in ("a", "b", "c")
    ]
    per_shard = [sketch.kmv_sketch(s, "v", k=32) for s in shards]
    merged = sketch.kmv_merge_sketches(per_shard, k=32)
    direct_input = shards[0]
    for s in shards[1:]:
        direct_input = direct_input.unionByName(s)
    direct = sketch.kmv_sketch(direct_input, "v", k=32)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in direct.collect()
    )


def test_kmv_pairwise_jaccard(spark):
    """Engineered overlaps: |A|=|B|=2000 with 1000 shared (J=1/3),
    C disjoint from both (J=0). Sketch-side estimate must land within
    ±4·RSE of the truth, and the disjoint pairs must estimate exactly 0
    (no shared hash can enter the union sketch)."""
    from yat_geo_db_spark.pipelines import sketch

    rows = (
        [("A", f"s{i}") for i in range(1000)]          # shared
        + [("B", f"s{i}") for i in range(1000)]
        + [("A", f"a{i}") for i in range(1000)]
        + [("B", f"b{i}") for i in range(1000)]
        + [("C", f"c{i}") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    out = {
        (r["g1"], r["g2"]): r
        for r in sketch.kmv_pairwise_jaccard(df, "v", "g", k=64).collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert ab["union_kept"] == 64
    assert abs(ab["jaccard_est"] - 1 / 3) < 0.25, ab
    for pair in (("A", "C"), ("B", "C")):
        assert out[pair]["both_in"] == 0
        assert out[pair]["jaccard_est"] == 0.0


def test_kmv_plan_shapes(spark):
    """Scale pins: the global sketch must plan as TakeOrderedAndProject
    (per-partition k-min + one merge — the engine executing the
    mergeable-sketch rollup), and the pairwise-overlap plan must not
    SortMergeJoin anywhere — the only joins are the broadcast pair frame
    (#groups² rows) against the sketches; the sole nested-loop join is
    the inequality self-join ON THE DISTINCT GROUP LIST, which is
    broadcast-tiny by construction."""
    from yat_geo_db_spark.pipelines import sketch

    df = spark.createDataFrame(
        [(f"g{i % 3}", f"v{i}") for i in range(300)], "g string, v string"
    )
    global_plan = sketch.kmv_sketch(df, "v", k=16)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in global_plan

    pair_plan = sketch.kmv_pairwise_jaccard(df, "v", "g", k=16)._jdf \
        .queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in pair_plan, pair_plan
