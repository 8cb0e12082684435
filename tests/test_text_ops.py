"""Semantic tests for text-pipeline operators whose oracle parity checks
only cross-engine equality, not direction/meaning."""

import pyspark.sql.functions as F


def test_dsir_importance_prefers_target_like_docs(spark):
    """A doc written in the target's vocabulary must score higher than one
    written in the off-target vocabulary, and the broadcast weight table
    is bounded by the bucket count."""
    from yat_geo_db_spark.pipelines.text import (
        DSIR_BUCKETS,
        dsir_bucket_table,
        dsir_importance,
    )

    tvocab = ["alpha", "beta", "gamma", "delta"]
    ovocab = ["uno", "dos", "tres", "cuatro"]
    rows = []
    for i in range(20):
        rows.append((i, " ".join(tvocab[j % 4] for j in range(i, i + 12)), "t"))
    for i in range(20, 40):
        rows.append((i, " ".join(ovocab[j % 4] for j in range(i, i + 12)), "o"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, kind string")
    target = docs.filter(F.col("kind") == "t")

    weights = dsir_bucket_table(target, docs)
    assert weights.count() <= DSIR_BUCKETS

    imp = {
        r["doc_id"]: r["importance"]
        for r in dsir_importance(docs, weights).collect()
    }
    target_scores = [imp[i] for i in range(20)]
    off_scores = [imp[i] for i in range(20, 40)]
    assert min(target_scores) > max(off_scores)


def test_mixture_resample_multiplicity(spark):
    """Weight w: every doc appears floor(w) or ceil(w) times; the stratum's
    total output mass is within one doc of w x input; weight 0 drops."""
    from yat_geo_db_spark.pipelines.text import mixture_resample

    docs = spark.createDataFrame(
        [(i, "s" + str(i % 3)) for i in range(300)],
        "doc_id long, source string",
    )
    out = mixture_resample(docs, {"s0": 2.5, "s1": 0.0}, strata_col="source")
    rows = out.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault((r["doc_id"], r["source"]), []).append(r["copy_idx"])
    # s1 dropped entirely
    assert not any(s == "s1" for (_, s) in per_doc)
    # s2 (unlisted) defaults to exactly 1 copy
    s2 = [k for k in per_doc if k[1] == "s2"]
    assert len(s2) == 100 and all(per_doc[k] == [0] for k in s2)
    # s0: every doc 2 or 3 copies, contiguous copy_idx, total ~2.5x
    s0_counts = [len(v) for k, v in per_doc.items() if k[1] == "s0"]
    assert all(c in (2, 3) for c in s0_counts)
    total = sum(s0_counts)
    assert abs(total - 250) <= 15  # hash-gated fraction ~ 0.5
    for k, v in per_doc.items():
        assert sorted(v) == list(range(len(v)))


def test_keyword_search_scan_equals_indexed(spark):
    """The inverted-index serving form returns exactly the pure-scan
    form's rows (ids AND scores), including multi-occurrence terms."""
    from yat_geo_db_spark.pipelines.text import (
        keyword_search_indexed,
        keyword_search_scan,
        postings_table,
    )
    from yat_geo_db_spark.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    terms = ["data", "table", "join"]
    scan = {
        (r["doc_id"], r["score"])
        for r in keyword_search_scan(docs, terms).collect()
    }
    idx = {
        (r["doc_id"], r["score"])
        for r in keyword_search_indexed(postings_table(docs), terms).collect()
    }
    assert scan == idx and scan  # identical and non-vacuous
    # duplicate query terms don't change AND semantics
    dup = {
        (r["doc_id"], r["score"])
        for r in keyword_search_scan(docs, ["data", "data", "table", "join"]).collect()
    }
    assert dup == scan


def test_winnowing_guarantee_and_edges(spark):
    """The winnowing guarantee: docs sharing a substring of length >=
    w + k - 1 share at least one fingerprint, wherever the substring
    sits. Plus the short-doc edge cases."""
    import random

    from yat_geo_db_spark.pipelines.text import winnowing_fingerprints

    k, w = 5, 4
    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rows, expect_pairs = [], []
    did = 0
    for case in range(10):
        shared = "".join(rng.choice(alpha) for _ in range(w + k - 1))
        pre1 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 20)))
        suf1 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 20)))
        pre2 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 20)))
        suf2 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 20)))
        rows += [(did, pre1 + shared + suf1), (did + 1, pre2 + shared + suf2)]
        expect_pairs.append((did, did + 1))
        did += 2
    # edges: shorter than k -> empty; k <= len < k + w - 1 -> one window
    rows += [(900, "abc"), (901, "abcdefg")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: set(r["fingerprints"])
        for r in winnowing_fingerprints(docs, k=k, w=w).collect()
    }
    for a, b in expect_pairs:
        assert out[a] & out[b], f"docs {a},{b} share an 8-char substring"
    assert out[900] == set()
    assert len(out[901]) == 1
    # density: winnowing keeps ~2/(w+1) of positions, far fewer than all
    long_doc = rows[0][1] * 5
    dense = spark.createDataFrame([(0, long_doc)], "doc_id long, text string")
    row = winnowing_fingerprints(dense, k=k, w=w).collect()[0]
    n_positions = len(long_doc) - k + 1
    assert row["n_fp"] < n_positions / 2


def test_phrase_search_scan_equals_indexed(spark):
    from yat_geo_db_spark.pipelines.text import (
        phrase_search_indexed,
        phrase_search_scan,
        positional_postings,
    )
    from yat_geo_db_spark.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    phrase = ["agg", "row"]
    scan = {
        (r["doc_id"], r["n_occurrences"])
        for r in phrase_search_scan(docs, phrase).collect()
    }
    idx = {
        (r["doc_id"], r["n_occurrences"])
        for r in phrase_search_indexed(
            positional_postings(docs), phrase
        ).collect()
    }
    assert scan == idx and scan
    assert any(n > 1 for _, n in scan)  # occurrence counting is exercised
    # overlapping occurrences count per starting position ("a a a" has 2 "a a")
    tiny = spark.createDataFrame(
        [(1, "a a a b"), (2, "b a b"), (3, "a b a b a")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["n_occurrences"])
        for r in phrase_search_scan(tiny, ["a", "a"]).collect()
    }
    assert got == {(1, 2)}
    got3 = {
        (r["doc_id"], r["n_occurrences"])
        for r in phrase_search_indexed(
            positional_postings(tiny), ["a", "b", "a"]
        ).collect()
    }
    assert got3 == {(3, 2)}


def test_cap_per_source_invariants(spark):
    """Per-source cap semantics: no source exceeds the cap, kept docs are
    the quality-top of their source (nothing dropped outranks anything
    kept), ranks are 1..n_kept dense, and under-cap sources keep
    everything."""
    from yat_geo_db_spark.pipelines.text import cap_per_source, quality_features
    from yat_geo_db_spark.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("lang") == "en"
    )
    cap = 11
    out = cap_per_source(docs, cap=cap).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    q = {
        r["doc_id"]: r["quality_score"]
        for r in quality_features(docs).collect()
    }
    src_sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    kept_ids = {r["doc_id"] for r in out}
    for src, rows in by_src.items():
        assert len(rows) <= cap
        assert sorted(r["src_rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        )
        if src_sizes[src] <= cap:
            assert len(rows) == src_sizes[src]
        else:
            # nothing dropped outranks anything kept: every dropped doc's
            # (quality, -id) must not beat the weakest kept doc's
            weakest = min((r["quality_score"], -r["doc_id"]) for r in rows)
            dropped = [
                d
                for d in docs.filter(F.col("source") == src)
                .select("doc_id")
                .collect()
                if d["doc_id"] not in kept_ids
            ]
            for d in dropped:
                assert (q[d["doc_id"]], -d["doc_id"]) < weakest


def test_search_ops_degenerate_inputs(spark):
    """Review regressions: empty term lists return empty results from
    BOTH keyword forms and bm25 (not all-docs, not a crash); empty
    phrases raise in both phrase forms."""
    import pytest

    from yat_geo_db_spark.pipelines.text import (
        bm25_topk,
        keyword_search_indexed,
        keyword_search_scan,
        phrase_search_indexed,
        phrase_search_scan,
        positional_postings,
        postings_table,
    )
    from yat_geo_db_spark.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    assert keyword_search_scan(docs, []).count() == 0
    assert keyword_search_indexed(postings_table(docs), []).count() == 0
    assert bm25_topk(docs, []).count() == 0
    with pytest.raises(ValueError, match="non-empty"):
        phrase_search_scan(docs, [])
    with pytest.raises(ValueError, match="non-empty"):
        phrase_search_indexed(positional_postings(docs), [])


def test_temperature_weights_math_and_mixture_handoff(spark):
    """alpha=1 is the identity (q == p, boost == 1); alpha=0 is uniform
    (q == 1/n_sources); alpha in (0,1) boosts the tail source above 1
    and damps the head below 1; and the boost dict feeds
    mixture_resample with expected mass q*total."""
    from yat_geo_db_spark.pipelines.text import temperature_sampling_weights

    docs = spark.createDataFrame(
        [(i, ("tok " * (90 if i % 10 else 10)).strip(),
          "head" if i % 10 else "tail")
         for i in range(100)],
        "doc_id long, text string, source string",
    )
    w1 = {r["source"]: r for r in
          temperature_sampling_weights(docs, alpha=1.0).collect()}
    for s in ("head", "tail"):
        assert abs(w1[s]["q_share"] - w1[s]["p_share"]) < 1e-6
        assert abs(w1[s]["boost"] - 1.0) < 1e-6
    w0 = {r["source"]: r for r in
          temperature_sampling_weights(docs, alpha=0.0).collect()}
    assert abs(w0["head"]["q_share"] - 0.5) < 1e-6
    assert abs(w0["tail"]["q_share"] - 0.5) < 1e-6
    wa = {r["source"]: r for r in
          temperature_sampling_weights(docs, alpha=0.3).collect()}
    assert wa["tail"]["boost"] > 1.0 > wa["head"]["boost"]
    assert abs(wa["head"]["q_share"] + wa["tail"]["q_share"] - 1.0) < 2e-6


def test_ngram_novelty_separates_original_from_recombined(spark):
    """An original doc scores 1.0, a doc stitched from another doc's
    phrases scores 0.0 for the shared grams, and a too-short doc gets
    NULL novelty with zero counts (ANSI-safe)."""
    from yat_geo_db_spark.pipelines.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),   # exact twin of 1
            (3, "completely fresh original sentence here"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, w=3).collect()}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0  # all shared
    assert out[3]["novelty"] == 1.0
    assert out[4]["n_grams"] == 0 and out[4]["novelty"] is None
