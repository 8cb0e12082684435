"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect — the 100 TB-honest way to measure) except the intentionally
driver-side scalar summaries, which are collected.

Protocol: every headline query runs TWICE and the MIN is reported. A single
cold run carries large run-to-run variance (first-touch codegen, JIT,
shuffle-file page cache — observed 1.6× spread between a driver run and a
same-box re-run in round 2); min-of-2 measures the pipeline, not the warmup
lottery, while keeping total bench runtime bounded (~2× one pass).

SHORT queries (best-of-2 under SHORT_QUERY_SEC) get a THIRD run: their
scheduler-latency noise floor is ±0.2-0.3 s, which reads as a fake ±15-25%
"regression" between rounds on min-of-2 (observed round 3→4: three
sub-second queries moved ±10-25% with no code change). The extra run costs
little precisely because the query is short.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline queries: one per operator family, heaviest plans included
HEADLINE = [
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "rel_q5_local_supplier_volume",
    "rel_top_orders_per_customer",
    "rel_sessionize",
    "rel_asof_click_view",
    "rel_interval_join",
    "geo_knn",
    "pipe_sample_stratified",
    "geo_fuzzy_city",
    "geo_radius_full",
    "geo_pair_distances",
    "pipe_dedup_exact",
    "pipe_dedup_minhash_lsh",
    "pipe_dedup_simhash",
    "pipe_sim_topk_brute",
    "pipe_text_quality",
    "pipe_text_fingerprint",
    "pipe_mm_features",
    "rel_q6_forecast_revenue",
    "rel_window_battery",
    "pipe_sim_kmeans",
    "pipe_dedup_clusters",
    "pipe_text_boilerplate",
    # round-3 additions (kept at the tail so earlier rounds' per-query
    # numbers stay comparable; the total now covers 27 queries)
    "pipe_text_dsir_importance",
    "pipe_decon_exact_ngram",
    "pipe_dedup_lines",
    # round-3 session-2 additions (tail, same comparability rule)
    "pipe_sim_filtered_topk",
    "pipe_quality_logreg",
    "pipe_dedup_merge_increment",
    "pipe_text_winnowing",
    "pipe_text_bm25",
    # round-4 additions (tail, same comparability rule): the round-3
    # heavy operators the verdict asked to track, plus the partsupp trio
    "pipe_sim_semdedup",
    "pipe_text_winnowing_pairs",
    "pipe_dedup_spans",
    "rel_scd2_intervals",
    "rel_q2_min_cost_supplier",
    "rel_q16_supplier_part_counts",
    "rel_q20_excess_stock",
    # round-4 session-3 additions (tail): this session's new operator
    # families — scan-bound PII scrub, batched hard-negative ANN, the
    # one-scan DQ rule battery, and iterative PageRank
    "pipe_pii_scrub",
    "pipe_sim_hard_negatives",
    "rel_dq_audit",
    "pipe_source_pagerank",
    "rel_cdc_apply",
    "pipe_mix_pipeline",
    "pipe_html_extract",
    # round-6 additions (tail): this round's new operator families —
    # mergeable rollup state, wedge-join triangles, the z-order layout
    # key, and the change-feed backfill diff
    "rel_incr_agg_merge",
    "pipe_graph_triangles",
    "rel_zorder_key",
    "rel_snapshot_diff",
    # round-6 continued: greedy MMR (k driver-probe rounds), seed-
    # relative PPR, and the bounded k-core peel
    "pipe_sim_mmr",
    "pipe_source_ppr",
    "pipe_graph_kcore",
    # round-6 session-3 additions (tail): bloom-pruned join, sorted-
    # neighborhood blocking (range-shuffle global rank), int8 SQ ANN,
    # and the PMI co-occurrence self-join
    "rel_bloom_prune_join",
    "pipe_dedup_sorted_neighborhood",
    "pipe_sim_sq8_topk",
    "pipe_text_pmi",
    # round-6 session-3 continued: session-basket rules, the rank-blend
    # mix composition, SCD2 point-in-time lookup, LPA communities, and
    # the pHash→CC image dedup chain
    "rel_assoc_rules",
    "pipe_curate_rank_mix",
    "rel_scd2_lookup",
    "pipe_graph_lpa",
    "pipe_mm_dedup_keep",
    "geo_density_hotspots",
    # round-6 session-3 final wave: timeout funnel (2 as-of hops),
    # exact DAU/MAU pair spread, the one-pass correlation matrix, and
    # geohash cell bucketing
    "rel_funnel_timeout",
    "rel_dau_mau",
    "rel_corr_matrix",
    "geo_geohash_cells",
    # experimentation/survival analytics + the multi-distinct profiler
    "pipe_cuped_experiment",
    "pipe_user_survival",
    "rel_table_stats",
    # round-13 session-2 addition (tail): KMV audience overlap — the
    # pairwise sketch join (per-type sketch → broadcast pair frame →
    # union-k-min) plus its exact-Jaccard twin in one line
    "pipe_sketch_kmv_overlap",
]


def _semdedup_autok(spark, sf_dir):
    """Bench-only twin of pipe_sim_semdedup with k=None: the production
    default auto-sizes the cell count (one extra count job over the
    checkpointed normalized table) — this line measures THAT path, while
    the registry query pins explicit k for its unrolled-Lloyd oracle."""
    from yat_geo_db_spark.pipelines import similarity
    from yat_geo_db_spark.queries.pipeline_queries import (
        COSINE_T, KMEANS_ITERS,
    )
    from yat_geo_db_spark.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semdedup_pairs(
        emb, k=None, threshold=COSINE_T, n_iter=KMEANS_ITERS
    )


def _semdedup_scaled(spark, sf_dir):
    """Bench-only: semdedup on the TWO-LEVEL k-means routing
    (similarity.semdedup_pairs_scaled) — the n·2√k assignment path that
    replaces the flat fit's n·k term when k grows with the corpus.
    Same auto-k cell sizing as _semdedup_autok, so the two lines
    isolate the routing cost."""
    from yat_geo_db_spark.pipelines import similarity
    from yat_geo_db_spark.queries.pipeline_queries import (
        COSINE_T, KMEANS_ITERS,
    )
    from yat_geo_db_spark.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # pinned p=1 since round 13 (when the library default flipped to
    # p=2): this line keeps measuring the primary-cell routing it has
    # measured since round 9, so its numbers stay comparable across
    # rounds; the _p2 line below measures the production default
    return similarity.semdedup_pairs_scaled(
        emb, threshold=COSINE_T, n_iter=KMEANS_ITERS, coarse_probes=1
    )


def _semdedup_scaled_p2(spark, sf_dir):
    """Bench-only: the two-level route with coarse_probes=2 — the
    LIBRARY DEFAULT since round 13 (strictly-better-or-tied recall at
    wall parity on every panel fixture; BENCHLOG round 13). Benched
    next to the p=1 line so the knob's cost claim (parity: only the
    √k-bounded n·k1 coarse pass is added) is re-priced every round."""
    from yat_geo_db_spark.pipelines import similarity
    from yat_geo_db_spark.queries.pipeline_queries import (
        COSINE_T, KMEANS_ITERS,
    )
    from yat_geo_db_spark.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semdedup_pairs_scaled(
        emb, threshold=COSINE_T, n_iter=KMEANS_ITERS, coarse_probes=2
    )


#: bench-only callables (not registry queries — no oracle needed; they
#: measure production-default paths the oracled twins pin for parity)
BENCH_ONLY = {
    "pipe_sim_semdedup_autok": _semdedup_autok,
    "pipe_sim_semdedup_scaled": _semdedup_scaled,
    "pipe_sim_semdedup_scaled_p2": _semdedup_scaled_p2,
}

HEADLINE.append("pipe_sim_semdedup_autok")
# round-9 addition (tail, same comparability rule): the two-level
# routing twin of the autok line
HEADLINE.append("pipe_sim_semdedup_scaled")
# round-12 addition (tail): the multi-probe recall knob next to its
# p=1 twin
HEADLINE.append("pipe_sim_semdedup_scaled_p2")


#: Stdout-elision priority (VERDICT r13 #1 — see the elision comment in
#: main()). The first _ELIDE_ALWAYS names are ALWAYS dropped from the
#: stdout JSON line: they are exactly the names the r13 line elided
#: (every one <0.5 s on every round on record), so the driver's
#: per-query map keeps the same 67 names round-over-round instead of
#: re-deciding the set from each run's timing noise. The rest of the
#: list is the committed OVERFLOW order (fastest-first as measured at
#: the r14 baseline — committed once, never re-derived per run) used
#: only if the line still exceeds the byte budget.
_ELIDE_PRIORITY = [
    "rel_interval_join",
    "pipe_sim_topk_brute",
    "pipe_text_quality",
    "pipe_text_fingerprint",
    "rel_q6_forecast_revenue",
    "pipe_pii_scrub",
    "pipe_html_extract",
    # --- overflow order (not elided unless the line overflows) ---
    "pipe_sim_filtered_topk",
    "pipe_decon_exact_ngram",
    "pipe_sim_hard_negatives",
    "rel_zorder_key",
    "pipe_dedup_exact",
    "pipe_sample_stratified",
    "pipe_mm_features",
    "rel_sessionize",
    "geo_knn",
    "pipe_dedup_lines",
    "geo_radius_full",
    "pipe_text_bm25",
    "rel_assoc_rules",
]
_ELIDE_ALWAYS = 7


def force(df) -> None:
    """Materialize the full result distributed-side (no collect)."""
    df.write.format("noop").mode("overwrite").save()


#: lines slower than this (shared-session best-of-N) are re-measured in a
#: FRESH session: late-in-bench heavy queries otherwise pay for 60+
#: predecessors' executor-heap litter and read 25-60% above their isolated
#: floor (observed r7: sorted_neighborhood 5.77 in-bench vs ~3.5-4.1
#: isolated), which makes cross-round diffs unattributable
ISOLATE_SEC = float(os.environ.get("SPARK_GRAFT_ISOLATE_SEC", "3.0"))


def _bench_session():
    from yat_geo_db_spark.session import get_spark

    spark = get_spark(app_name="yat_geo_db_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warm(spark, registry) -> None:
    """Warm the JVM/codegen paths and the Python/Arrow worker pool once
    so per-query numbers measure the pipelines, not first-job setup."""
    registry["rel_q1_pricing_summary"][0](spark, SF_DIR).limit(1).count()
    from pyspark.sql import functions as F

    _noop_udf = F.pandas_udf(lambda s: s, "long")
    spark.range(64).select(_noop_udf(F.col("id"))).write.format("noop").mode(
        "overwrite"
    ).save()


def _measure(spark, registry, names) -> dict[str, float]:
    """min-of-N timing loop over `names` (shared protocol for the main
    pass and the isolated re-measure pass)."""
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # 4.0 (was 2.0): round 5 saw 13-37% swings on 2-3.5 s queries whose
    # code did not change — min-of-3 now covers that band too (pagerank
    # at ~3.2 s was the largest unexplained mover on min-of-2)
    short_query_sec = float(os.environ.get("SPARK_GRAFT_SHORT_SEC", "4.0"))
    timings: dict[str, float] = {}
    for name in names:
        fn = BENCH_ONLY[name] if name in BENCH_ONLY else registry[name][0]
        best = float("inf")
        runs = runs_per_query
        done = 0
        while done < runs:
            t0 = time.perf_counter()
            force(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
            done += 1
            # short queries get one extra run: their ±0.2-0.3 s scheduler
            # noise floor otherwise reads as a fake cross-round regression
            if done == runs_per_query and best < short_query_sec:
                runs = runs_per_query + 1
        timings[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)
        # a query's persisted indexes help ITS second run, then become
        # dead weight that evicts later queries' working sets (observed:
        # kmeans 2.0 s isolated vs 4.8 s late in the bench) — drop them
        spark.catalog.clearCache()
    return timings


def _isolated_child(names: list[str]) -> None:
    """--isolated mode: fresh session, same warmup + protocol, one JSON
    line of {name: sec} on stdout.

    Each target runs ONCE untimed before the measured min-of-N: a
    fresh JVM pays first-touch codegen/JIT/Arrow-worker costs that the
    shared session amortized long before these late heavy lines ran,
    and without the throwaway the child's "floor" came out ABOVE the
    shared number on half the lines (r8 driver run: ppr 7.14 vs 3.59)
    — a ceiling masquerading as a floor. With it, the measured runs
    start from the same warmed state as any shared-session re-run, so
    min(shared, isolated) is attribution-meaningful."""
    from yat_geo_db_spark.queries import all_queries

    spark = _bench_session()
    registry = all_queries()
    _warm(spark, registry)
    for name in names:
        fn = BENCH_ONLY[name] if name in BENCH_ONLY else registry[name][0]
        force(fn(spark, SF_DIR))
        spark.catalog.clearCache()
    print(json.dumps(_measure(spark, registry, names)))


def main() -> None:
    from yat_geo_db_spark.queries import all_queries

    spark = _bench_session()
    registry = all_queries()
    _warm(spark, registry)
    timings = _measure(spark, registry, HEADLINE)

    # attribution pass: heavy lines re-measured in ONE fresh session so
    # their numbers reflect the plan, not 60 predecessors' heap litter;
    # keep the min (the isolated floor can only remove pollution, and a
    # line that got FASTER in the shared session is real too)
    heavy = [n for n, t in timings.items() if t > ISOLATE_SEC]
    isolated: dict[str, float] = {}
    if heavy and not os.environ.get("SPARK_GRAFT_NO_ISOLATE"):
        import subprocess

        # release the shared session's executor threads and heap FIRST —
        # a child JVM racing the parent for local[N] cores measures
        # contention, not the plan (observed: triangles 3.8 s shared
        # read 19.5 s "isolated" under a live parent). stop() alone is
        # not enough: the py4j-launched JVM lingers with its peak heap
        # until the gateway dies (observed: still 17 s vs a 4.2 s
        # truly-standalone floor), so shut the gateway down too.
        spark.stop()
        try:
            from pyspark import SparkContext

            SparkContext._gateway.shutdown()
            SparkContext._gateway = None
            SparkContext._jvm = None
        except Exception:
            pass
        print(f"# isolated re-measure: {heavy}", file=sys.stderr)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--isolated", ",".join(heavy)],
            capture_output=True, text=True, env=os.environ.copy(),
        )
        sys.stderr.write(out.stderr)
        try:
            isolated = json.loads(out.stdout.strip().splitlines()[-1])
        except (ValueError, IndexError):
            print("# isolated pass failed; keeping shared-session "
                  "numbers", file=sys.stderr)
        for n, t in isolated.items():
            if t < timings[n]:
                print(f"# {n}: {timings[n]:.3f}s shared -> {t:.3f}s "
                      "isolated", file=sys.stderr)
                timings[n] = t

    total = sum(timings.values())
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # raw fresh-JVM re-measurements (post-throwaway-warmup min-of-N) go
    # to STDERR: "queries" already carries min(shared, isolated) for
    # those lines; this record only exists so cross-round diffs can
    # attribute a move to plan change vs shared-session heap pollution.
    # It must NOT ride on the stdout result line — the driver captures
    # a bounded TAIL of stdout and parses the last line as JSON, and
    # round 10's line (isolated_floor inline, default separators) grew
    # past the capture window, truncating the FRONT of the one line
    # that matters (BENCH_r10.json "parsed": null).
    print(f"# isolated_floor: {json.dumps(isolated)}", file=sys.stderr)
    # the FULL per-query map (3 dp, nothing elided) rides on stderr so
    # BENCHLOG diffs keep their precision even when the stdout line
    # drops fast rows to fit the capture window
    print(f"# full_queries: {json.dumps(timings, separators=(',', ':'))}",
          file=sys.stderr)

    # The driver captures a bounded 2000-char TAIL of stdout and parses
    # the LAST line as JSON. Rounds 10 and 11 both shipped a ~2.1 KB
    # line, so the FRONT of the line fell outside the window and
    # BENCH_r{10,11}.json recorded "parsed": null. The only robust fix
    # is to keep the WHOLE line under the window: headline fields lead,
    # per-query timings go to 2 dp, and rows are elided down to the
    # budget, with the elision count recorded so a reader knows the map
    # is partial.
    #
    # WHICH rows get elided is PINNED (VERDICT r13 #1): rounds 12-13
    # re-decided the elided set from each run's own timings, so the set
    # drifted with scheduler noise and the driver's round-over-round
    # map diff manufactured phantom dropped/new queries
    # (pipe_sim_topk_brute in r13 — ran, passed, got FASTER, and read
    # as "dropped_from_bench" because it fell under that run's elision
    # cutoff). The first _ELIDE_ALWAYS names of _ELIDE_PRIORITY are
    # always elided — exactly the seven names the r13 stdout line
    # elided, so the name set visible to the driver is unchanged and
    # stable; should the line ever exceed the budget anyway, FURTHER
    # names come from the same committed list in order (then any
    # stragglers by name), never from this run's timings. The full
    # 74-name map always rides on stderr (full_queries above).
    # tests/test_bench_contract.py pins the budget arithmetic.
    line_budget = int(os.environ.get("SPARK_GRAFT_BENCH_LINE_BYTES", "1900"))
    inline = {n: round(t, 2) for n, t in timings.items()}
    elided = 0
    payload = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "queries": inline,
    }
    for name in _ELIDE_PRIORITY[:_ELIDE_ALWAYS]:
        if name in inline:
            del inline[name]
            elided += 1
    payload["queries_elided"] = elided
    line = json.dumps(payload, separators=(",", ":"))
    overflow = [
        n for n in _ELIDE_PRIORITY[_ELIDE_ALWAYS:] if n in inline
    ] + sorted(n for n in inline if n not in _ELIDE_PRIORITY)
    for name in overflow:
        if len(line) <= line_budget:
            break
        del inline[name]
        elided += 1
        payload["queries_elided"] = elided
        line = json.dumps(payload, separators=(",", ":"))
    print(line, flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--isolated":
        _isolated_child([n for n in sys.argv[2].split(",") if n])
    else:
        main()
