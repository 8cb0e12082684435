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


def test_pii_scrub_patterns_and_stage_order(spark):
    """Each PII type is detected with word-boundary discipline, counts are
    per-type with n_pii the sum, and the scrub order means a card's digit
    groups never double-count as phones."""
    from yat_geo_db_spark.pipelines.text import pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "mail bob@corp.example now"),
            (1, "card 4111-1111-1111-1111 and 4111 1111 1111 1111"),
            (2, "ssn 123-45-6789 inline"),
            (3, "host 10.0.0.1 but version 1.2.3 stays"),
            (4, "call (415) 555-0123 or 415-555-0123 or +1 415.555.0123"),
            (5, "serialx4111-1111-1111-1111 glued stays"),
            (6, "clean text no pii at all"),
            (7, "serial x415-555-01234 glued stays too"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert rows[0]["n_email"] == 1 and "<EMAIL>" in rows[0]["scrubbed"]
    assert rows[1]["n_card"] == 2 and rows[1]["n_phone"] == 0
    assert rows[2]["n_ssn"] == 1 and "<SSN>" in rows[2]["scrubbed"]
    assert rows[3]["n_ipv4"] == 1 and "1.2.3 stays" in rows[3]["scrubbed"]
    assert rows[4]["n_phone"] == 3
    # a digit run glued to a word char fails \b — not a card
    assert rows[5]["n_card"] == 0 or "<CARD>" not in rows[5]["scrubbed"]
    assert rows[6]["n_pii"] == 0
    assert rows[6]["scrubbed"] == "clean text no pii at all"
    # phone has the same boundary discipline: glued digits stay intact
    assert rows[7]["n_phone"] == 0
    assert rows[7]["scrubbed"] == "serial x415-555-01234 glued stays too"
    for r in rows.values():
        assert r["n_pii"] == (
            r["n_email"] + r["n_card"] + r["n_ssn"] + r["n_ipv4"] + r["n_phone"]
        )


def test_pii_report_per_source_rates(spark):
    from yat_geo_db_spark.pipelines.text import pii_report, pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "write to a@b.co", "web"),
            (1, "nothing here", "web"),
            (2, "all clean", "books"),
            (3, "also clean", "books"),
        ],
        "doc_id long, text string, source string",
    )
    rep = {r["source"]: r for r in pii_report(pii_scrub(docs), docs).collect()}
    assert rep["web"]["n_docs"] == 2 and rep["web"]["n_docs_with_pii"] == 1
    assert abs(rep["web"]["pii_doc_rate"] - 0.5) < 1e-9
    assert rep["web"]["total_email"] == 1
    assert rep["books"]["n_docs_with_pii"] == 0
    assert rep["books"]["pii_doc_rate"] == 0.0


def test_vocab_coverage_ranks_and_mass(spark):
    """Known counts -> deterministic ranks (count desc, token asc) and an
    exact cumulative-share curve ending at 1.0."""
    from yat_geo_db_spark.pipelines.text import vocab_coverage

    docs = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a b z")],
        "doc_id long, text string",
    )
    # counts: a=4, b=3, c=1, z=1 (total 9); tie c<z alphabetically
    rows = {r["token"]: r for r in vocab_coverage(docs).collect()}
    assert [rows[t]["rank"] for t in "abcz"] == [1, 2, 3, 4]
    assert abs(rows["a"]["cum_share"] - round(4 / 9, 6)) < 1e-9
    assert abs(rows["b"]["cum_share"] - round(7 / 9, 6)) < 1e-9
    assert abs(rows["z"]["cum_share"] - 1.0) < 1e-9


def test_split_leakage_audit_counts(spark):
    """Hand-built splits: val shares exactly one 3-gram with train, test
    shares none."""
    from yat_geo_db_spark.pipelines.curation import split_leakage_audit

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c x"), (2, "p q r s")],
        "doc_id long, text string",
    )
    splits = spark.createDataFrame(
        [(0, "train"), (1, "val"), (2, "test")],
        "doc_id long, split string",
    )
    out = {r["split"]: r for r in
           split_leakage_audit(docs, splits, w=3).collect()}
    assert out["val"]["n_grams"] == 2 and out["val"]["n_shared"] == 1
    assert abs(out["val"]["leak_rate"] - 0.5) < 1e-9
    assert out["test"]["n_grams"] == 2 and out["test"]["n_shared"] == 0


def test_blocklist_filter_counts_occurrences(spark):
    """Counts token OCCURRENCES (not distinct types) and keeps on the <=
    boundary."""
    from yat_geo_db_spark.pipelines.text import blocklist_filter

    docs = spark.createDataFrame(
        [(0, "bad bad bad ok"), (1, "bad ok ok"), (2, "clean words only"),
         (3, "badge ok")],  # substrings must NOT match
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           blocklist_filter(docs, ("bad",), max_hits=1).collect()}
    assert out[0]["n_blocked"] == 3 and not out[0]["keep"]
    assert out[1]["n_blocked"] == 1 and out[1]["keep"]
    assert out[2]["n_blocked"] == 0 and out[2]["keep"]
    assert out[3]["n_blocked"] == 0 and out[3]["keep"]


def test_weighted_sample_exact_k_semantics(spark):
    """Exactly k rows; non-positive/NULL weights excluded; with uniform
    weights the selection is the top-k by the hash alone; inclusion is
    monotone in weight for a fixed key (raising a doc's weight can only
    improve its key)."""
    from yat_geo_db_spark.pipelines.text import weighted_sample_exact_k

    docs = spark.createDataFrame(
        [(i, 10.0 if i != 3 else -1.0) for i in range(50)]
        + [(99, None)],
        "doc_id long, w double",
    )
    out = weighted_sample_exact_k(docs, F.col("w"), k=5).collect()
    assert len(out) == 5
    assert all(r["doc_id"] not in (3, 99) for r in out)
    # monotonicity: boost one selected doc's weight -> it stays selected
    winner = out[0]["doc_id"]
    boosted = docs.withColumn(
        "w", F.when(F.col("doc_id") == winner, 1000.0).otherwise(F.col("w"))
    )
    out2 = weighted_sample_exact_k(boosted, F.col("w"), k=5).collect()
    assert any(r["doc_id"] == winner for r in out2)


def test_epoch_shuffle_invariants(spark):
    """Shard is epoch-stable; positions are a dense 1..n permutation
    within every (epoch, shard); the epoch orders differ."""
    from yat_geo_db_spark.pipelines.curation import epoch_shuffle

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    rows = epoch_shuffle(docs, n_epochs=3, n_shards=4).collect()
    by_doc: dict = {}
    groups: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["epoch"]] = (
            r["shard"], r["position"]
        )
        groups.setdefault((r["epoch"], r["shard"]), []).append(r["position"])
    for d, eps in by_doc.items():
        assert len(eps) == 3
        assert len({s for s, _ in eps.values()}) == 1  # stable shard
    for (_e, _s), ps in groups.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))  # dense perm
    # orders differ between epochs (some doc moved within its shard)
    assert any(
        eps[0][1] != eps[1][1] for eps in by_doc.values()
    )
    # degenerate n_epochs would sequence() BACKWARD — must refuse
    import pytest

    with pytest.raises(ValueError):
        epoch_shuffle(docs, n_epochs=0)


def test_sample_to_token_budget_semantics(spark):
    """Each group's taken tokens overshoot the budget by at most one doc;
    a group under budget keeps everything; unlisted groups drop; the
    weighted order prefers heavy docs (monotone in weight)."""
    from yat_geo_db_spark.pipelines.text import sample_to_token_budget

    docs = spark.createDataFrame(
        [(i, ("tok " * 10).strip(), "a") for i in range(20)]  # 10 tokens each
        + [(100 + i, ("tok " * 5).strip(), "b") for i in range(3)]  # 15 total
        + [(200, "x", "unlisted")],
        "doc_id long, text string, source string",
    )
    out = sample_to_token_budget(docs, {"a": 35, "b": 1000}).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # a: docs of 10 tokens; prev_cum < 35 admits cum 10,20,30,40 -> 4 docs
    assert len(by_src["a"]) == 4
    assert max(r["cum_tokens"] for r in by_src["a"]) == 40  # ≤ one doc over
    # b: under budget -> all 3 kept
    assert len(by_src["b"]) == 3
    assert "unlisted" not in by_src
    # weighted path: NULL/non-positive weights are excluded (a negative
    # weight would flip ln(u)/w positive and outrank every valid doc)
    weighted = sample_to_token_budget(
        docs.withColumn(
            "w", F.when(F.col("doc_id") == 0, -5.0).otherwise(1.0)
        ),
        {"a": 35, "b": 1000},
        weight_col=F.col("w"),
    ).collect()
    assert all(r["doc_id"] != 0 for r in weighted)


def test_curriculum_order_buckets_monotone(spark):
    """Percentile buckets are score-monotone (max of bucket i <= min of
    bucket i+1), all n_buckets appear on a spread distribution, and
    positions are dense 1..k permutations per bucket."""
    from yat_geo_db_spark.pipelines.curation import curriculum_order

    docs = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id long, s double"
    )
    rows = curriculum_order(docs, F.col("s"), n_buckets=4).collect()
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    for b in range(3):
        assert max(r["score"] for r in by_bucket[b]) <= min(
            r["score"] for r in by_bucket[b + 1]
        )
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault((r["bucket"], r["shard"]), []).append(
            r["position"]
        )
    for cell, ps in by_cell.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    import pytest

    with pytest.raises(ValueError):
        curriculum_order(docs, F.col("s"), n_buckets=1)


def test_html_to_text_extraction(spark):
    """Script/style/comment interiors never leak (even when they contain
    markup or '<'), entities decode exactly one level, counts are right,
    and pathological markup degrades to whitespace, not an exception."""
    from yat_geo_db_spark.pipelines.text import html_to_text

    docs = spark.createDataFrame(
        [
            (0, "<html><body><script>var a = '<p>fake</p>';</script>"
                "<STYLE>h1 {x: 1 < 2}</STYLE><h1>Real</h1>"
                "<!-- <b>ghost</b> --><p>body &amp; soul &lt;tag&gt;</p>"
                "</body></html>"),
            (1, "no markup at all"),
            (2, "broken <unclosed and &amp;lt; double"),
        ],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: r for r in html_to_text(docs).collect()}
    assert out[0]["extracted"] == "Real body & soul <tag>"
    assert out[0]["n_dropped_blocks"] == 2
    assert "fake" not in out[0]["extracted"]
    assert "ghost" not in out[0]["extracted"]
    assert out[1]["extracted"] == "no markup at all"
    assert out[1]["n_tags"] == 0 and out[1]["n_dropped_blocks"] == 0
    # entity-of-entity decodes ONE level (&amp;lt; -> &lt;, not <)
    assert "&lt;" in out[2]["extracted"]
    # script-before-comment order: an unbalanced '<!--' inside a script
    # string must not swallow visible text up to a later real comment
    tricky = spark.createDataFrame(
        [(0, "<script>var s='<!--';</script>Visible text<!-- footer -->")],
        "doc_id long, html string",
    )
    row = html_to_text(tricky).collect()[0]
    assert row["extracted"] == "Visible text"
    assert row["n_dropped_blocks"] == 1
    # stage-wise audit: a commented-out script counts as a comment, not
    # as a dropped block (nothing was removed BY the script stage)
    commented = spark.createDataFrame(
        [(0, "<!-- <script>x</script> --><p>hi</p>")],
        "doc_id long, html string",
    )
    row2 = html_to_text(commented).collect()[0]
    assert row2["extracted"] == "hi"
    assert row2["n_dropped_blocks"] == 1  # the <script>x</script> stage hit


def test_pmi_cooccurrence_ranks_true_collocation(spark):
    """A planted always-together pair must outscore an independent pair;
    stop terms (df > max_df_frac·N) and hapax terms must be cut from
    candidate generation entirely."""
    import pyspark.sql.functions as F
    from yat_geo_db_spark.pipelines.text import pmi_cooccurrence

    # 20 docs: 'alpha beta' always co-occur (10 docs); 'gamma' floats
    # independently; 'the' is in every doc (stop); 'rare' appears once.
    rows = []
    for i in range(10):
        rows.append((i, "the alpha beta filler%d" % (i % 3)))
    for i in range(10, 20):
        extra = " rare" if i == 10 else ""
        rows.append((i, "the gamma filler%d%s" % (i % 3, extra)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_cooccurrence(
        docs, min_df=2, max_df_frac=0.8, top_k=100
    ).collect()
    pairs = {(r["term_a"], r["term_b"]): r["pmi"] for r in out}
    terms = {t for p in pairs for t in p}
    assert "the" not in terms and "rare" not in terms
    # alpha+beta: c_ab=10, c_a=c_b=10, N=20 -> pmi = ln(2)
    assert abs(pairs[("alpha", "beta")] - 0.693147) < 1e-6
    # alpha vs gamma never co-occur -> absent
    assert ("alpha", "gamma") not in pairs
    # collocation outscores a filler pairing
    assert all(
        pairs[("alpha", "beta")] >= v for v in pairs.values()
    )


def test_weighted_sample_per_group_exact_k_and_short_groups(spark):
    """Each group keeps exactly k rows (or all when smaller); weights
    <= 0 are excluded; ranks are dense 1..k."""
    import pyspark.sql.functions as F
    from yat_geo_db_spark.pipelines.text import weighted_sample_per_group

    rows = [(i, "big", float(1 + i % 7)) for i in range(40)]
    rows += [(100 + i, "small", 2.0) for i in range(3)]
    rows += [(200, "small", 0.0), (201, "small", -1.0)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w double")
    out = weighted_sample_per_group(df, ["src"], F.col("w"), k=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r["rank"])
    assert sorted(by_src["big"]) == [1, 2, 3, 4, 5]
    assert sorted(by_src["small"]) == [1, 2, 3]  # zero/neg weights excluded
    assert {r["doc_id"] for r in out if r["src"] == "small"} == {100, 101, 102}


def test_quantile_normalize_bounds_and_order(spark):
    """pctl must be 0 at the min, 1 at the max, monotone with value,
    tie-broken by id; single-row input maps to 0.5."""
    from yat_geo_db_spark.pipelines.text import quantile_normalize

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 20), (4, 40), (5, None)],
        "doc_id long, n_chars long",
    )
    got = {
        r["doc_id"]: r["pctl"]
        for r in quantile_normalize(df, "n_chars").collect()
    }
    assert got[1] == 0.0 and got[4] == 1.0
    assert got[2] == 0.333333 and got[3] == 0.666667  # id tie-break
    assert 5 not in got
    one = spark.createDataFrame([(1, 9)], "doc_id long, n_chars long")
    assert quantile_normalize(one, "n_chars").collect()[0]["pctl"] == 0.5


def test_zipf_fit_recovers_planted_exponent(spark):
    """A synthetic corpus built with count(rank) = C·rank^(-0.8) must fit
    slope ≈ −0.8 with r² ≈ 1; NumPy polyfit on the same rounded points
    must agree to 6 dp."""
    import math

    import numpy as np

    from yat_geo_db_spark.pipelines.text import zipf_fit

    # build docs whose token counts follow an exact power law
    rows, doc_id = [], 0
    toks = []
    for rank in range(1, 41):
        cnt = max(2, int(round(1000 * rank ** -0.8)))
        toks += [f"w{rank:03d}"] * cnt
    # pack tokens into docs of 50
    for i in range(0, len(toks), 50):
        rows.append((doc_id, " ".join(toks[i : i + 50])))
        doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = zipf_fit(docs).collect()[0]
    assert -0.85 < got["slope"] < -0.75
    assert got["r2"] > 0.98

    # exact agreement with a local fit on the same rounded points
    from collections import Counter

    counts = Counter(toks)
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (round(math.log(r + 1), 6), round(math.log(c), 6))
        for r, (_, c) in enumerate(ordered)
        if c >= 2
    ]
    x = np.array([p[0] for p in pts]); y = np.array([p[1] for p in pts])
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(got["slope"] - round(slope, 6)) < 2e-6
    assert abs(got["intercept"] - round(intercept, 6)) < 2e-6


def test_neyman_allocation_favors_high_variance(spark):
    """A high-variance stratum must receive more budget than an
    equal-sized low-variance one; a CONSTANT stratum draws nothing;
    allocations never exceed stratum size; the draw is replayable."""
    from yat_geo_db_spark.pipelines.text import neyman_allocation_sample

    rows = []
    for i in range(100):
        rows.append((i, "wild", float((i * 7919) % 1000)))      # sd ~ 290
        rows.append((1000 + i, "tame", 500.0 + (i % 3)))        # sd ~ 0.8
        rows.append((2000 + i, "flat", 42.0))                   # sd = 0
    df = spark.createDataFrame(rows, "doc_id long, src string, x double")
    out = neyman_allocation_sample(df, ["src"], "x", total_n=60).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    assert "flat" not in by_src
    assert len(by_src["wild"]) > len(by_src.get("tame", [])) * 10
    assert all(len(v) <= 100 for v in by_src.values())
    alloc = {s: v[0]["n_alloc"] for s, v in by_src.items()}
    assert all(len(v) == alloc[s] for s, v in by_src.items())
    again = neyman_allocation_sample(df, ["src"], "x", total_n=60).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_source_vocab_overlap_golden(spark):
    """Identical-vocab sources score 1; disjoint score absent (no
    common token row); a half-overlap pair computes the exact
    Jaccard; presence-based (token multiplicity irrelevant)."""
    from yat_geo_db_spark.pipelines.text import source_vocab_overlap

    rows = [
        (1, "sa", "alpha beta gamma"),
        (2, "sb", "alpha alpha beta gamma"),      # same vocab as sa
        (3, "sc", "alpha beta delta epsilon"),    # 2 of 4 shared with sa
        (4, "sd", "zeta eta"),                    # disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["source_a"], r["source_b"]): r["jaccard"]
        for r in source_vocab_overlap(docs).collect()
    }
    assert got[("sa", "sb")] == 1.0
    assert got[("sa", "sc")] == 0.4  # |{alpha,beta}| / |{a,b,g,d,e}|
    assert ("sa", "sd") not in got


def test_burstiness_separates_topical_from_function_words(spark):
    """A term concentrated in few docs must out-VMR an evenly-spread
    term of the SAME total count — the separation raw frequency can't
    make; exact VMR checked by hand."""
    from yat_geo_db_spark.pipelines.text import term_burstiness

    rows = []
    # 20 docs; 'the' once per doc (even); 'llama' 20× in one doc (burst)
    for i in range(20):
        body = "the filler"
        if i == 0:
            body += " " + " ".join(["llama"] * 20)
        rows.append((i, body))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["token"]: r for r in term_burstiness(docs, min_total=10, top_k=10).collect()
    }
    # llama: S=20, Q=400, N=20 -> mean 1, E[c^2] 20, var 19, vmr 19
    assert got["llama"]["vmr"] == 19.0 and got["llama"]["df"] == 1
    # the: S=20, Q=20 -> var 0, vmr 0 (perfectly even)
    assert got["the"]["vmr"] == 0.0 and got["the"]["df"] == 20
    assert got["llama"]["total_count"] == got["the"]["total_count"] == 20
