"""Scale-safety of pairwise near-dup candidate generation: blocking must be
(a) LOSSLESS for the promised band and (b) near-linear in candidate volume
on a single-language corpus — no block the size of the whole corpus."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from yat_geo_db_spark.pipelines import dedup

VOCAB = [f"tok{i}" for i in range(400)]


def _corpus(spark, n=120, seed=7):
    """Single-language corpus with a handful of planted near-dup pairs."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        toks = [VOCAB[rng.randrange(len(VOCAB))] for _ in range(40)]
        rows.append((i, " ".join(toks), "en", "web"))
    # planted dups: exact copies (hamming 0 — always inside any band; a
    # one-token edit on a 40-token doc flips several majority-boundary bits,
    # SimHash's documented short-doc weakness, so it may leave the band)
    for j, src in enumerate((3, 17, 42)):
        rows.append((1000 + j, rows[src][1], "en", "web"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _brute_force_pairs(spark, docs, max_hamming):
    """The O(N²) definition the blocked path must reproduce exactly."""
    sigs = dedup.simhash_table(docs, block_cols=("lang", "source"))
    a = sigs.select(
        F.col("doc_id").alias("id1"), F.col("lang").alias("l1"),
        F.col("source").alias("src1"), F.col("sig").alias("s1"),
    )
    b = sigs.select(
        F.col("doc_id").alias("id2"), F.col("lang").alias("l2"),
        F.col("source").alias("src2"), F.col("sig").alias("s2"),
    )
    out = (
        a.join(
            b,
            (F.col("id1") < F.col("id2"))
            & (F.col("l1") == F.col("l2"))
            & (F.col("src1") == F.col("src2")),
        )
        .withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )
    return sorted(map(tuple, out.collect()))


@pytest.mark.parametrize("max_hamming", [1, 6])
def test_simhash_segment_blocking_is_lossless(spark, max_hamming):
    docs = _corpus(spark).cache()
    blocked = sorted(
        map(
            tuple,
            dedup.simhash_pairs(
                docs, max_hamming=max_hamming, block_cols=("lang", "source")
            ).collect(),
        )
    )
    assert blocked == _brute_force_pairs(spark, docs, max_hamming)
    assert len(blocked) >= 3  # the planted near-dups are found


def test_simhash_candidate_volume_near_linear(spark):
    """On a 123-doc SINGLE-language corpus the old lang-block generated
    N(N-1)/2 = 7503 candidates; segment blocking must stay near-linear."""
    docs = _corpus(spark).cache()
    n = docs.count()
    sigs = dedup.simhash_table(docs, block_cols=("lang", "source"))
    cand = dedup.simhash_candidates(sigs, max_hamming=1, block_cols=("lang", "source"))
    n_cand = cand.count()
    assert n_cand < 4 * n  # near-linear, nowhere near N²/2
    # and the candidates still contain every true ≤1-hamming pair
    true_pairs = {(r[0], r[1]) for r in _brute_force_pairs(spark, docs, 1)}
    cand_pairs = {(r["id1"], r["id2"]) for r in cand.collect()}
    assert true_pairs <= cand_pairs


def _emb_corpus(spark, n=80, dim=8, seed=11):
    """Single-label embeddings with planted near-identical pairs."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, "same_label", v))
    for j, src in enumerate((2, 9, 31)):
        v = [x + rng.uniform(-1e-4, 1e-4) for x in rows[src][2]]
        rows.append((2000 + j, "same_label", v))
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )


def test_cosine_bucket_blocking_volume_and_recall(spark):
    """The block key is the sign-bit bucket, not the label: on a single-label
    corpus the label block would compare all N(N-1)/2 pairs; bucket blocking
    compares only same/adjacent-bucket pairs and still finds every planted
    near-identical pair (their buckets agree — perturbation ≪ |components|)."""
    from yat_geo_db_spark.pipelines import similarity

    docs = _emb_corpus(spark).cache()
    n = docs.count()
    got = similarity.cosine_near_dup_pairs(
        docs, threshold=0.999, bits=8, hamming_probe=1
    )
    pairs = {(r["id1"], r["id2"]) for r in got.collect()}
    assert {(2, 2000), (9, 2001), (31, 2002)} <= pairs

    # candidate volume: count the joined pairs pre-threshold via cosine -1
    cand = similarity.cosine_near_dup_pairs(
        docs, threshold=-1.0, bits=8, hamming_probe=1
    ).count()
    assert cand < n * (n - 1) / 2 / 4  # well under the all-pairs block


def test_kmeans_init_non_contiguous_ids(spark):
    """Init must be the k SMALLEST ids (sort+limit), not `id < k` — on
    sparse ids the latter yields fewer than k centroids."""
    from yat_geo_db_spark.pipelines import similarity

    rng = random.Random(3)
    rows = [
        (100 + 17 * i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.kmeans_fit_assign(emb, k=4, n_iter=1).cache()
    assert out.count() == 40                      # every vector assigned
    cids = {r["cid"] for r in out.select("cid").distinct().collect()}
    assert cids <= {100, 117, 134, 151}           # the 4 smallest ids
    assert len(cids) >= 2                         # real clustering happened


def test_ngram_jaccard_prefix_filter_is_exact(spark):
    """The prefix-filtered set-similarity join must return EXACTLY the
    all-pairs-within-blocks result (prefix filtering is lossless, unlike
    LSH banding), with near-linear candidate volume."""
    docs = _corpus(spark).cache()
    got = sorted(
        map(
            tuple,
            dedup.ngram_jaccard_pairs(
                docs, threshold=0.5, block_cols=("lang", "source")
            ).collect(),
        )
    )
    # brute force: all pairs within (lang, source), exact jaccard
    g = docs.select(
        "doc_id", "lang", "source",
        F.array_distinct(dedup.char_ngrams(F.col("text"))).alias("grams"),
    )
    a = g.select(
        F.col("doc_id").alias("id1"), F.col("lang").alias("l1"),
        F.col("source").alias("s1"), F.col("grams").alias("g1"),
    )
    b = g.select(
        F.col("doc_id").alias("id2"), F.col("lang").alias("l2"),
        F.col("source").alias("s2"), F.col("grams").alias("g2"),
    )
    inter = F.size(F.array_intersect("g1", "g2")).cast("double")
    union = F.size("g1") + F.size("g2") - inter
    brute = (
        a.join(
            b,
            (F.col("id1") < F.col("id2"))
            & (F.col("l1") == F.col("l2"))
            & (F.col("s1") == F.col("s2")),
        )
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= 0.5)
        .select("id1", "id2", "jaccard")
    )
    assert got == sorted(map(tuple, brute.collect()))
    assert len(got) >= 3  # planted exact copies (jaccard 1.0) found

def test_ngram_jaccard_prefix_candidate_volume(spark):
    """Prefix-filter candidate volume tracks ACTUAL gram sharing, not the
    block size: on a single-language corpus of mostly-disjoint docs (rich
    gram space, like real text) candidates collapse to ~the true near-dup
    pairs, where the old lang-block compared all N(N-1)/2."""
    import string

    rng = random.Random(13)
    letters = string.ascii_lowercase

    def word():
        return "".join(rng.choice(letters) for _ in range(7))

    rows = [(i, " ".join(word() for _ in range(8)), "en", "web") for i in range(150)]
    for j, src in enumerate((4, 40, 77)):           # planted exact copies
        rows.append((3000 + j, rows[src][1], "en", "web"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).cache()
    n = docs.count()
    prefix = dedup.jaccard_prefix_table(docs, 0.5, block_cols=("lang", "source"))
    cand = (
        prefix.alias("x")
        .join(
            prefix.alias("y"),
            (F.col("x.g") == F.col("y.g"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id"), F.col("y.doc_id"))
        .distinct()
        .count()
    )
    assert cand < 4 * n                             # near-linear, not N²/2
    pairs = {
        (r["id1"], r["id2"])
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.5, block_cols=("lang", "source")
        ).collect()
    }
    assert {(4, 3000), (40, 3001), (77, 3002)} <= pairs


def test_lsh_band_join_aqe_splits_hot_band(spark):
    """An adversarially hot LSH band (hundreds of near-identical docs → one
    band bucket holding most of the corpus) must be handled by AQE's
    skew-join split, not ground through one straggler partition. Thresholds
    are lowered to make the toy corpus cross the skew bar; at 100 TB the
    defaults (256 MB) trigger the same mechanism."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # sub-KB thresholds: MapStatus reports COMPRESSED partition bytes,
        # and an adversarial hot band is maximally repetitive — lz4 shrinks
        # MBs of identical rows to a few KB. At 100 TB the same mechanism
        # trips the default 256 MB bar because real dup clusters carry
        # real entropy.
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "256b",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        rng = random.Random(5)
        base = " ".join(VOCAB[rng.randrange(len(VOCAB))] for _ in range(30))
        rows = [(i, base + f" tail{i % 3}", "en", "web") for i in range(800)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9).agg(
            F.count(F.lit(1)).alias("n")
        )
        # collect() executes THIS dataset's QueryExecution, so its AQE plan
        # is final (an aggregate keeps the driver-side result tiny — the hot
        # band yields ~N²/2 pairs by construction)
        assert pairs.collect()[0]["n"] > 0
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # the band self-join splits the hot partition on BOTH sides
        assert "SortMergeJoin(skew=true)" in plan, plan[:3000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_segment_starts_cover_all_bits():
    for d in (0, 1, 3, 6, 15):
        segs = dedup._simhash_segment_starts(d)
        assert len(segs) == d + 1
        assert sum(w for _, w in segs) == dedup.SIMHASH_BITS
        pos = 0
        for start, width in segs:
            assert start == pos and width >= 1
            pos += width


def test_simhash_short_text_regime_split(spark):
    """Pins the SimHash short-text boundary that justifies curation's
    length routing (curation.SIMHASH_MIN_TOKENS): on ~54-token docs,
    near-IDENTICAL pairs land within the hamming ≤ 3 band but MODERATE
    near-dups (char-gram jaccard .5-.7) spread far outside it — SimHash's
    known short-text weakness — while on 300-token docs the band works.
    near_dup_pairs therefore routes short docs to exact Jaccard and long
    docs to SimHash, and the union catches everything the band misses."""
    import random

    from yat_geo_db_spark.pipelines.curation import near_dup_pairs
    from yat_geo_db_spark.pipelines.dedup import (
        ngram_jaccard_pairs,
        simhash_pairs,
        simhash_table,
    )

    vocab = [
        f"w{chr(97 + i)}{chr(97 + j)}{k}"
        for i in range(6) for j in range(6) for k in range(3)
    ]

    def doc(n, seed):
        r = random.Random(seed)
        return " ".join(r.choice(vocab) for _ in range(n))

    def mutate(text, frac, seed):
        r = random.Random(seed)
        words = text.split()
        for i in r.sample(range(len(words)), int(len(words) * frac)):
            words[i] = r.choice(vocab)
        return " ".join(words)

    base54 = doc(54, 1)
    base300 = doc(300, 4)
    docs = spark.createDataFrame(
        [
            (1, base54, "en", "s"),
            (2, mutate(base54, 0.04, 2), "en", "s"),   # near-identical short
            (3, mutate(base54, 0.45, 3), "en", "s"),   # moderate near-dup short
            (10, base300, "en", "s"),
            (11, mutate(base300, 0.03, 5), "en", "s"),  # near-identical long
        ],
        "doc_id long, text string, lang string, source string",
    )

    sigs = {r["doc_id"]: r["sig"] for r in simhash_table(docs).collect()}

    def ham(a, b):
        return bin(sigs[a] ^ sigs[b]).count("1")

    # the regime split itself
    assert ham(1, 2) <= 2, "near-identical short docs must sit in the band"
    assert ham(10, 11) <= 2, "near-identical long docs must sit in the band"
    assert ham(1, 3) > 3, "moderate short near-dups fall OUT of the band"
    # the moderate pair is a true near-dup by the exact metric
    jacc = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, threshold=0.5, block_cols=("lang", "source")
        ).collect()
    }
    assert jacc[(1, 3)] >= 0.5
    # the raw band join misses it; the routed graph does not
    sim = {
        (r["id1"], r["id2"])
        for r in simhash_pairs(
            docs, max_hamming=3, block_cols=("lang", "source")
        ).collect()
    }
    assert (1, 3) not in sim and (10, 11) in sim
    routed = {
        (r["id1"], r["id2"])
        for r in near_dup_pairs(docs, block_cols=("lang", "source")).collect()
    }
    assert {(1, 2), (1, 3), (2, 3), (10, 11)} <= routed
    # long docs never enter the (quadratic-ish) Jaccard side: every routed
    # pair involving them came from the signature join
    assert all(a >= 10 and b >= 10 for a, b in routed if a >= 10 or b >= 10)


def test_routed_pairs_catch_cross_boundary_near_dups(spark):
    """The routing overlap-band argument, exercised: a true near-dup pair
    straddling the short/long boundary (one doc under SIMHASH_MIN_TOKENS,
    one over) must still be found — Jaccard ≥ 0.5 bounds pair sizes within
    2×, so both ends sit inside the Jaccard band [0, 2·min_tokens)."""
    import random

    from yat_geo_db_spark.pipelines.curation import near_dup_pairs
    from yat_geo_db_spark.pipelines.dedup import ngram_jaccard_pairs

    r = random.Random(11)
    vocab = [f"tok{i:03d}" for i in range(400)]
    short_words = [r.choice(vocab) for _ in range(100)]   # < 128 tokens
    # long doc = the short doc plus a suffix → high char-gram overlap,
    # 180 tokens (>= 128, so it ALSO enters the simhash side)
    long_words = short_words + [r.choice(vocab) for _ in range(80)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(short_words), "en", "s"),
            (2, " ".join(long_words), "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    # the pair is a true near-dup by the exact metric
    exact = ngram_jaccard_pairs(docs, threshold=0.5,
                                block_cols=("lang", "source")).collect()
    assert [(r_["id1"], r_["id2"]) for r_ in exact] == [(1, 2)]
    routed = {
        (r_["id1"], r_["id2"])
        for r_ in near_dup_pairs(docs, block_cols=("lang", "source")).collect()
    }
    assert (1, 2) in routed


def test_exact_ngram_decontamination_and_broadcast(spark):
    """A doc embedding one verbatim benchmark 13-gram is dropped even
    though it is globally dissimilar; clean docs survive. The benchmark
    gram index must be on the broadcast side of the join (the corpus side
    is the 100 TB side — it must not shuffle)."""
    from yat_geo_db_spark.pipelines.dedup import (
        exact_ngram_decontaminate,
        exact_ngram_matches,
    )

    bench_sentence = " ".join(f"b{i}" for i in range(13))
    corpus = spark.createDataFrame(
        [
            # 13 verbatim benchmark tokens inside an otherwise-unique doc
            (10, "x1 x2 " + bench_sentence + " x3 x4"),
            (11, " ".join(f"c{i}" for i in range(40))),  # clean
            (12, "too short"),                            # < 13 tokens: clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, bench_sentence + " tail1 tail2")], "doc_id long, text string"
    )
    hits = exact_ngram_matches(corpus, bench, w=13)
    assert [(r["doc_id"], r["bench_doc_id"]) for r in hits.collect()] == [(10, 1)]
    kept = sorted(
        r["doc_id"] for r in exact_ngram_decontaminate(corpus, bench).collect()
    )
    assert kept == [11, 12]
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bloom_decon_no_false_negatives_and_fp_accounting(spark, monkeypatch):
    """The Bloom probe's one-sided error, demonstrated both ways: at the
    production bitset size every exactly-contaminated doc is flagged (no
    false negatives — the guarantee decontamination rests on) with zero
    false positives on this corpus; under a deliberately tiny bitset
    (m=64) collisions are forced and flagged docs must be a SUPERSET of
    the exact matches — never a subset. The probe side must stay
    shuffle-free: the one-row bitset broadcasts."""
    from yat_geo_db_spark.pipelines import dedup as d

    bench_sentence = " ".join(f"b{i}" for i in range(13))
    corpus = spark.createDataFrame(
        [(10, "x1 x2 " + bench_sentence + " x3 x4")]
        + [(20 + i, " ".join(f"c{i}_{j}" for j in range(30))) for i in range(8)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, bench_sentence + " tail1 tail2")], "doc_id long, text string"
    )
    exact = {r["doc_id"] for r in d.exact_ngram_matches(corpus, bench).collect()}

    out = {r["doc_id"]: r for r in d.bloom_contamination(corpus, bench).collect()}
    flagged = {i for i, r in out.items() if r["contaminated"]}
    assert exact <= flagged            # no false negatives
    assert flagged == exact == {10}    # and no FPs at m=2^20 here
    assert out[10]["n_flagged_grams"] == 1   # exactly the b0..b12 window

    monkeypatch.setattr(d, "BLOOM_BITS", 1)  # one bit: every probe collides
    tiny = {r["doc_id"]: r for r in d.bloom_contamination(corpus, bench).collect()}
    assert exact <= {i for i, r in tiny.items() if r["contaminated"]}
    for r in tiny.values():                  # saturated filter: all-FP, but
        assert r["contaminated"]             # still NEVER a false negative
        assert r["n_flagged_grams"] == r["n_grams"]

    probe = d.bloom_contamination(corpus, bench)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan   # 1-row bitset broadcast
    assert "SortMergeJoin" not in plan


def test_remove_duplicate_lines_first_occurrence_wins(spark):
    """Repeated lines keep exactly the (min doc_id, min pos) occurrence;
    unique lines are untouched; a doc of only repeats comes back empty."""
    from yat_geo_db_spark.pipelines.dedup import remove_duplicate_lines

    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared line\nbeta"),
            (2, "shared line\ngamma\nshared line"),
            (3, "shared line"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in remove_duplicate_lines(docs).collect()}
    assert out[1] == "alpha\nshared line\nbeta"
    assert out[2] == "gamma"          # both repeats dropped, order kept
    assert out[3] == ""               # only-repeats doc survives, empty


def test_remove_duplicate_lines_within_doc_scope(spark):
    """within_doc=True: a doc repeating its own line keeps one copy;
    identical lines in OTHER docs are untouched."""
    from yat_geo_db_spark.pipelines.dedup import remove_duplicate_lines

    docs = spark.createDataFrame(
        [
            (1, "nav\nbody one\nnav"),
            (2, "nav\nbody two"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_lines(docs, within_doc=True).collect()
    }
    assert out[1] == "nav\nbody one"
    assert out[2] == "nav\nbody two"


def test_remove_repeated_spans_quote_level_dedup(spark):
    """A doc embedding another doc's 9-token span loses exactly the quote
    and keeps its own prose; the source doc (globally first) is untouched;
    an exact duplicate doc empties entirely."""
    from yat_geo_db_spark.pipelines.dedup import remove_repeated_spans

    quote = " ".join(f"q{i}" for i in range(9))
    a = "a1 a2 " + quote + " a3 a4"
    b = "b1 b2 b3 b4 " + quote + " b5 b6"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, a)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(docs, span_tokens=8).collect()
    }
    assert out[1] == a                              # first occurrence intact
    assert out[2] == "b1 b2 b3 b4 b5 b6"            # quote removed, prose kept
    assert out[3] == ""                             # exact dup emptied


def test_line_and_span_dedup_under_hot_key_skew(spark):
    """Adversarial hot key: ONE line/span repeated 5000 times across docs
    (the boilerplate worst case — every occurrence lands in a single rank
    partition). Results stay exact: the first occurrence survives, all
    other repeats drop."""
    from yat_geo_db_spark.pipelines.dedup import (
        remove_duplicate_lines, remove_repeated_spans,
    )

    hot = "x " * 7 + "x"  # 8 identical tokens — also a single 8-token span
    rows = [(0, "unique zero\n" + hot)]
    rows += [(i, hot + "\ntail " + str(i)) for i in range(1, 5001)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = remove_duplicate_lines(docs)
    kept_hot = out.filter(out.text.contains(hot)).count()
    assert kept_hot == 1  # only doc 0 keeps the hot line
    assert out.count() == 5001

    # span skew: pure space-separated docs (newlines would merge into
    # tokens and change the window content per doc)
    sdocs = spark.createDataFrame(
        [(i, f"p{i} " + hot) for i in range(5000)],
        "doc_id long, text string",
    )
    spans = remove_repeated_spans(sdocs, span_tokens=8)
    still = spans.filter(spans.text.contains(hot)).count()
    assert still == 1  # doc 0 (globally first) keeps the hot span
    assert spans.filter(spans.text == "p17").count() == 1  # prose survives


def test_routed_pairs_catch_degenerate_repetition(spark):
    """Review regression: token-count routing alone loses a pair whose
    gram sets are identical but token counts straddle both bands
    ('x '*100 vs 'x '*300 — J=1.0, 100 tokens vs 300). The
    degenerate-gram-floor guard routes both to the Jaccard band."""
    from yat_geo_db_spark.pipelines.curation import near_dup_pairs

    docs = spark.createDataFrame(
        [
            (1, ("x " * 100).strip(), "en", "s"),
            (2, ("x " * 300).strip(), "en", "s"),
            (3, "completely different content here", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    routed = {
        (r["id1"], r["id2"])
        for r in near_dup_pairs(docs, block_cols=("lang", "source")).collect()
    }
    assert (1, 2) in routed


def test_lsh_recall_eval_zero_pair_corpus_no_ansi_abort(spark):
    """ADVICE regression (round 4): a clean corpus sample with ZERO exact
    (and zero LSH) near-dup pairs used to abort the whole job with ANSI
    DIVIDE_BY_ZERO on the recall/precision ratios. Guarded ratios emit
    NULL ("undefined"), counts stay exact."""
    from yat_geo_db_spark.pipelines.dedup import lsh_recall_eval

    docs = spark.createDataFrame(
        [(i, f"totally unique text number {i} with body {i * 17}")
         for i in range(10)],
        "doc_id long, text string",
    )
    row = lsh_recall_eval(docs, sample_mod=1).collect()[0]
    assert row["n_exact_pairs"] == 0 and row["n_lsh_pairs"] == 0
    assert row["recall"] is None and row["precision"] is None


def test_dedup_keep_best_prefers_quality_over_min_id(spark):
    """dedup_keep_best keeps the max-score cluster member (min id only on
    ties), unpaired docs always survive, and with a constant score it
    degrades to exactly dedup_keep_canonical's min-id rule."""
    from yat_geo_db_spark.pipelines.dedup import (
        dedup_keep_best,
        dedup_keep_canonical,
    )

    docs = spark.createDataFrame(
        [
            (1, "a", 10), (2, "a", 30), (3, "a", 20),   # cluster: best=2
            (7, "b", 5), (8, "b", 5),                   # tie: min id 7
            (9, "c", 1),                                # unpaired
        ],
        "doc_id long, text string, score long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id1 long, id2 long"
    )
    kept = {
        r["doc_id"]
        for r in dedup_keep_best(docs, pairs, "score").collect()
    }
    assert kept == {2, 7, 9}
    const = docs.withColumn("score", docs.score * 0)
    kb = {r["doc_id"] for r in dedup_keep_best(const, pairs, "score").collect()}
    kc = {r["doc_id"] for r in dedup_keep_canonical(const, pairs).collect()}
    assert kb == kc == {1, 7, 9}


def test_url_canonicalization_merges_crawl_variants(spark):
    """url_canonical_col collapses scheme/case/www/query/fragment/
    trailing-slash variants to one key; dedup_by_url keeps the min id
    per key with the right group size; distinct pages stay distinct."""
    from yat_geo_db_spark.pipelines.curation import dedup_by_url

    docs = spark.createDataFrame(
        [
            (1, "https://WWW.Example.com/a/b?utm_source=x&ref=y"),
            (2, "http://example.com/a/b/"),
            (3, "https://example.com/a/b#frag"),
            (4, "https://example.com/a/c"),
            (5, "https://sub.example.com/a/b"),
        ],
        "doc_id long, url string",
    )
    out = {r["url_canonical"]: r for r in dedup_by_url(docs).collect()}
    assert out["example.com/a/b"]["doc_id"] == 1
    assert out["example.com/a/b"]["url_group_size"] == 3
    assert out["example.com/a/c"]["url_group_size"] == 1
    assert out["sub.example.com/a/b"]["url_group_size"] == 1


def test_url_dedup_null_and_empty_keys_pass_through(spark):
    """Review regression: docs with NO usable key (NULL url, scheme-only,
    whitespace) must each survive as their own group — one NULL-key
    group would keep a single doc out of thousands of unrelated
    metadata-less ones. Embedded newlines are stripped pre-regex (the
    Java-vs-RE2 '$' divergence), so the noisy twin still merges."""
    from yat_geo_db_spark.pipelines.curation import dedup_by_url

    docs = spark.createDataFrame(
        [
            (1, None),
            (2, "https://"),
            (3, "   "),
            (4, "https://example.com/a?x=1\ntrail"),
            (5, "https://example.com/a?x=1trail"),
        ],
        "doc_id long, url string",
    )
    rows = dedup_by_url(docs).collect()
    kept = {r["doc_id"]: r for r in rows}
    assert {1, 2, 3} <= set(kept)  # each no-key doc survives alone
    for i in (1, 2, 3):
        assert kept[i]["url_canonical"] is None
        assert kept[i]["url_group_size"] == 1
    # newline stripped → 4 and 5 canonicalize identically and merge
    assert kept[4]["url_canonical"] == "example.com/a"
    assert kept[4]["url_group_size"] == 2 and 5 not in kept


def test_global_rank_matches_single_window(spark):
    """Distributed rank (range shuffle + local row_number + offsets) must
    equal the single-window global row_number for a total order, at a
    partition count that actually splits the data."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from yat_geo_db_spark.pipelines.dedup import global_rank

    df = spark.range(0, 997).select(
        F.col("id"),
        F.concat(F.lit("k"), F.pmod(F.col("id") * 7919, F.lit(97))).alias("k"),
    )
    got = {
        (r["id"], r["rank"])
        for r in global_rank(df, ["k", "id"], n_parts=8).collect()
    }
    want = {
        (r["id"], r["rank"])
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("k", "id"))
        ).collect()
    }
    assert got == want


def test_sorted_neighborhood_finds_prefix_sorted_dups(spark):
    """Docs identical up to a trailing tweak sort adjacently and must be
    paired; docs with unrelated text must not pair. Window bound respected:
    no pair's ranks can differ by >= window."""
    import pyspark.sql.functions as F
    from yat_geo_db_spark.pipelines.dedup import sorted_neighborhood_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "the quick brown fox jumps over the lazy dog near the creek"),
        (3, "completely different content about spark shuffle planning"),
        (4, "zzz unrelated tail entry about parquet row group statistics"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            docs, window=4, threshold=0.5, n_parts=2
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(p in {(1, 2)} for p in pairs)


def test_sorted_neighborhood_rejects_window_one(spark):
    import pytest
    from yat_geo_db_spark.pipelines.dedup import sorted_neighborhood_pairs

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(docs, window=1)


def test_containment_one_sided_prefix_filter_is_exact(spark):
    """containment_pairs must equal the brute-force directed containment
    over all ordered within-block pairs (the one-sided prefix filter is
    lossless), and must catch the asymmetric case symmetric Jaccard
    misses: a short snippet embedded verbatim in a long document."""
    docs = _corpus(spark, n=60).select("doc_id", "text", "lang")
    # plant: doc 9000 = a verbatim slice of doc 0's text (C(snip->0)=~1,
    # while Jaccard(snip, 0) is far below any useful threshold)
    base = docs.filter(F.col("doc_id") == 0).first()["text"]
    snip = spark.createDataFrame(
        [(9000, base[: len(base) // 4], "en")], "doc_id long, text string, lang string"
    )
    corpus = docs.unionByName(snip)

    t = 0.9
    got = {
        (r["id_in"], r["id_out"]): r["containment"]
        for r in dedup.containment_pairs(corpus, threshold=t).collect()
    }
    assert (9000, 0) in got and got[(9000, 0)] >= 0.99
    assert (0, 9000) not in got  # directed: the long doc is NOT contained

    # brute force over all ordered pairs (block = single language here)
    g = dedup.distinct_grams_table(corpus, block_cols=("lang",))
    a = g.select(F.col("doc_id").alias("id_in"), F.col("grams").alias("gi"), "lang")
    b = g.select(F.col("doc_id").alias("id_out"), F.col("grams").alias("go"),
                 F.col("lang").alias("lang_r"))
    brute = (
        a.join(b, (F.col("lang") == F.col("lang_r"))
               & (F.col("id_in") != F.col("id_out")))
        .withColumn("c", dedup.containment_col(F.col("gi"), F.col("go")))
        .filter(F.col("c") >= t)
    )
    want = {(r["id_in"], r["id_out"]): r["c"] for r in brute.collect()}
    assert got == want


def test_materialize_releases_index_caches(spark):
    """ADVICE r9: the pair builders persist index frames the returned
    lazy plan references, leaking storage in long-lived sessions.
    materialize=True must return the SAME pairs with every cache
    released before the call returns."""
    from yat_geo_db_spark.pipelines import dedup

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "the quick brown fox jumped over the lazy dog", "en"),
            (3, "a completely different sentence about xylophones", "en"),
            (4, "the quick brown fox", "en"),
        ],
        "doc_id long, text string, lang string",
    )

    def cache_is_empty() -> bool:
        return bool(
            spark._jsparkSession.sharedState().cacheManager().isEmpty()
        )

    spark.catalog.clearCache()
    for fn, kw in (
        (dedup.ngram_jaccard_pairs, dict(threshold=0.5)),
        (dedup.containment_pairs, dict(threshold=0.8)),
        (dedup.minhash_lsh_pairs, dict(threshold=0.5)),
        (dedup.simhash_pairs, dict(max_hamming=10)),
    ):
        lazy = sorted(map(tuple, fn(docs, **kw).collect()))
        spark.catalog.clearCache()  # release the lazy call's caches
        eager = sorted(map(tuple, fn(docs, materialize=True, **kw).collect()))
        assert eager == lazy, fn.__name__
        assert cache_is_empty(), f"{fn.__name__} leaked a cached table"


def test_containment_candidate_estimate_exact(spark):
    """The estimator must equal an independent brute-force computation
    of Σ over prefix entries (doc, g) of (df_block(g) − 1), mirroring
    the rarest-first (global df, then gram) prefix ordering."""
    import math

    from yat_geo_db_spark.pipelines import dedup

    rows = [
        (1, "abcabcxyz", "en"),
        (2, "abcabcdef", "en"),
        (3, "xyzdefabc", "en"),
        (4, "abcabcxyz", "de"),
        (5, "zzzzzzzzz", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    t, n = 0.8, 3

    def grams(txt):
        return sorted({txt[i:i + n] for i in range(len(txt) - n + 1)})

    df_global, df_block = {}, {}
    for _, txt, lang in rows:
        for g in grams(txt):
            df_global[g] = df_global.get(g, 0) + 1
            df_block[(lang, g)] = df_block.get((lang, g), 0) + 1
    want = 0
    eps = 1e-9
    for _, txt, lang in rows:
        gs = sorted(grams(txt), key=lambda g: (df_global[g], g))
        sz = len(gs)
        plen = sz - math.ceil(t * sz - eps) + 1
        for g in gs[:plen]:
            want += df_block[(lang, g)] - 1

    got = dedup.containment_candidate_estimate(docs, threshold=t, n=n)
    assert got == want
    # the estimate upper-bounds the verified pair volume
    pairs = dedup.containment_pairs(docs, threshold=t, n=n).count()
    assert got >= pairs


def test_containment_auto_n_scales_gram_size_with_density(spark):
    """containment_auto_n must pick a LARGER gram size on a corpus that
    saturates the small-gram space (tiny vocabulary, many docs) than on
    a sparse one — and containment_pairs(n=None) must equal the fixed-n
    call at the chosen size."""
    import itertools

    from yat_geo_db_spark.pipelines import dedup

    # dense: 60 docs over a 6-word pool — every 3-gram is corpus-common
    pool = ["alpha", "bravo", "carol", "delta", "echos", "fotox"]
    dense_rows = [
        (i, " ".join(pool[(i + j) % 6] for j in range(12)), "en")
        for i in range(60)
    ]
    dense = spark.createDataFrame(
        dense_rows, "doc_id long, text string, lang string"
    )
    # sparse: 8 docs with doc-unique words — 3-grams individuate
    sparse = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}q{j}xk{i * 31 + j}" for j in range(12)), "en")
            for i in range(8)
        ],
        "doc_id long, text string, lang string",
    )

    n_dense, est_dense = dedup.containment_auto_n(
        dense, threshold=0.8, per_doc_budget=8.0
    )
    n_sparse, est_sparse = dedup.containment_auto_n(
        sparse, threshold=0.8, per_doc_budget=8.0
    )
    assert n_sparse == 3
    assert n_dense > n_sparse

    auto = sorted(map(tuple, dedup.containment_pairs(
        dense, threshold=0.8, n=None,
    ).collect()))
    fixed = sorted(map(tuple, dedup.containment_pairs(
        dense, threshold=0.8, n=n_dense,
    ).collect()))
    assert auto == fixed


def test_ngram_jaccard_candidate_estimate_exact(spark):
    """The symmetric estimator must equal the brute-force sum of
    C(prefix_count, 2) over (block, prefix gram), with the same
    rarest-first prefix ordering as jaccard_prefix_table."""
    import math

    from yat_geo_db_spark.pipelines import dedup

    rows = [
        (1, "abcabcxyz", "en"),
        (2, "abcabcdef", "en"),
        (3, "xyzdefabc", "en"),
        (4, "abcabcxyz", "de"),
        (5, "abcabcxyq", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    t, n = 0.5, 3

    def grams(txt):
        return sorted({txt[i:i + n] for i in range(len(txt) - n + 1)})

    df_global = {}
    for _, txt, _lang in rows:
        for g in grams(txt):
            df_global[g] = df_global.get(g, 0) + 1
    pc = {}
    eps = 1e-9
    for _, txt, lang in rows:
        gs = sorted(grams(txt), key=lambda g: (df_global[g], g))
        sz = len(gs)
        plen = sz - math.ceil(t * sz - eps) + 1
        for g in gs[:plen]:
            pc[(lang, g)] = pc.get((lang, g), 0) + 1
    want = sum(c * (c - 1) // 2 for c in pc.values())

    got = dedup.ngram_jaccard_candidate_estimate(docs, threshold=t, n=n)
    assert got == want
    assert got >= dedup.ngram_jaccard_pairs(docs, threshold=t, n=n).count()


def test_ngram_jaccard_auto_n_and_none_wiring(spark):
    """Auto gram sizing for the symmetric join: a gram-space-saturating
    corpus pushes n up; n=None equals the fixed-n call at the chosen
    size."""
    from yat_geo_db_spark.pipelines import dedup

    pool = ["alpha", "bravo", "carol", "delta", "echos", "fotox"]
    dense = spark.createDataFrame(
        [(i, " ".join(pool[(i + j) % 6] for j in range(12)), "en")
         for i in range(60)],
        "doc_id long, text string, lang string",
    )
    n_dense, _ = dedup.ngram_jaccard_auto_n(
        dense, threshold=0.5, per_doc_budget=8.0
    )
    assert n_dense > 3

    auto = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        dense, threshold=0.5, n=None,
    ).collect()))
    fixed = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        dense, threshold=0.5, n=n_dense,
    ).collect()))
    assert auto == fixed


def _array_carrying_exchanges(df) -> list[tuple[str, str, str]]:
    """(node, attr, type) for every Exchange output attribute of array
    type in the physical plan — the exploded verify must produce NONE
    (its whole point is a fixed-width narrow shuffle)."""
    out: list[tuple[str, str, str]] = []

    def walk(node):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.initialPlan())
            return
        if "Exchange" in name:
            attrs = node.output()
            for i in range(attrs.size()):
                a = attrs.apply(i)
                dt = a.dataType().simpleString()
                if dt.startswith("array"):
                    out.append((name, a.name(), dt))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_exploded_verify_matches_broadcast_and_ships_no_arrays(spark):
    """VERDICT r10 task 1: past the broadcast ceiling the gram verify
    must ship narrow (pair, gram-hash) rows, never the full gram
    arrays (the measured 21×-on-10×-candidates cliff / >80 GB spill
    regime). Three pins: (a) both routes emit IDENTICAL pairs and
    scores for Jaccard and containment; (b) the exploded plan has NO
    Exchange whose output carries an array column; (c) verify='auto'
    flips to the exploded route when the session broadcast threshold
    says the grams table does not fit."""
    from yat_geo_db_spark.pipelines import dedup

    random.seed(31)
    pool = [f"w{i:02d}" for i in range(40)]
    rows = []
    for i in range(80):
        words = [pool[random.randrange(40)] for _ in range(24)]
        rows.append((i, " ".join(words), "en"))
        if i % 4 == 0:  # planted near-dup: one word changed
            dup = list(words)
            dup[3] = pool[(i + 1) % 40]
            rows.append((i + 10_000, " ".join(dup), "en"))
        if i % 5 == 0:  # planted containment: half-length snippet
            rows.append((i + 20_000, " ".join(words[:12]), "en"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )

    jb = dedup.ngram_jaccard_pairs(docs, 0.5, n=7, verify="broadcast")
    je = dedup.ngram_jaccard_pairs(docs, 0.5, n=7, verify="exploded")
    got_b = sorted(map(tuple, jb.collect()))
    got_e = sorted(map(tuple, je.collect()))
    assert got_b and got_b == got_e
    assert _array_carrying_exchanges(je) == []

    cb = dedup.containment_pairs(docs, 0.8, n=7, verify="broadcast")
    ce = dedup.containment_pairs(docs, 0.8, n=7, verify="exploded")
    cgot_b = sorted(map(tuple, cb.collect()))
    cgot_e = sorted(map(tuple, ce.collect()))
    assert cgot_b and cgot_b == cgot_e
    assert _array_carrying_exchanges(ce) == []
    # the broadcast route, by contrast, does carry arrays — through
    # BroadcastExchange only (each executor holds ONE copy; no
    # per-pair shuffle of arrays there either)
    assert all(
        node.startswith("BroadcastExchange")
        for node, _, _ in _array_carrying_exchanges(cb)
    )

    # auto-routing: with the ceiling floored to 1 byte the grams table
    # cannot broadcast and 'auto' must produce the narrow plan
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        ja = dedup.ngram_jaccard_pairs(docs, 0.5, n=7, verify="auto")
        assert _array_carrying_exchanges(ja) == []
        assert sorted(map(tuple, ja.collect())) == got_b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    spark.catalog.clearCache()

    with pytest.raises(ValueError, match="verify must be"):
        dedup.containment_pairs(docs, 0.8, n=7, verify="nope")


def test_gram_bloom_miss_bound_is_lossless(spark):
    """The shuffle-route verify's bloom prefilter rests on ONE
    invariant: popcount(bloom_A & ~bloom_B) ≤ |grams(A) \\ grams(B)|
    for EVERY pair (each gram sets exactly one bit; a bit set by A and
    clear in B is witnessed by ≥1 distinct A-gram absent from B).
    Check it against exact set differences on random pairs, and the
    exact-containment corner: A ⊆ B ⇒ the bound is exactly 0, so a
    verbatim-substring pair can never be pruned."""
    import itertools

    from yat_geo_db_spark.pipelines import dedup

    random.seed(97)
    pool = [f"t{i:02d}" for i in range(30)]
    rows = []
    texts = {}
    for i in range(24):
        words = [pool[random.randrange(30)] for _ in range(18)]
        texts[i] = " ".join(words)
        rows.append((i, texts[i]))
        if i % 6 == 0:  # A ⊆ B by construction (verbatim prefix)
            texts[i + 100] = texts[i][: len(texts[i]) // 2]
            rows.append((i + 100, texts[i + 100]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    grams_tbl = dedup.distinct_grams_table(docs, n=5)
    blooms = {
        r["_bid"]: [r[f"_w{i}"] for i in range(dedup._BLOOM_WORDS)]
        for r in dedup._gram_bloom_table(grams_tbl, "doc_id").collect()
    }
    gsets = {
        r["doc_id"]: set(r["grams"]) for r in grams_tbl.collect()
    }

    def miss_lb(a, b):
        return sum(
            bin(x & ~y & 0xFFFFFFFFFFFFFFFF).count("1")
            for x, y in zip(blooms[a], blooms[b])
        )

    checked = 0
    for a, b in itertools.permutations(sorted(gsets), 2):
        true_misses = len(gsets[a] - gsets[b])
        assert miss_lb(a, b) <= true_misses, (a, b)
        checked += 1
    assert checked > 100
    for i in range(0, 24, 6):  # verbatim containment: bound exactly 0
        assert gsets[i + 100] <= gsets[i]
        assert miss_lb(i + 100, i) == 0


def test_candidate_estimate_sampled_extrapolation(spark):
    """sample_fraction=f probes a seeded doc sample and extrapolates by
    1/f²: identity at f=1.0, same order of magnitude as the exact
    estimate at f=0.5 on a homogeneous corpus (the pair term's
    extrapolation is exactly unbiased given the prefix), and the
    guard rails reject a caller-supplied grams_tbl or an out-of-range
    fraction."""
    import pytest

    from yat_geo_db_spark.pipelines import dedup

    pool = ["alpha", "bravo", "carol", "delta", "echos", "fotox",
            "golfy", "hotel"]
    docs = spark.createDataFrame(
        [(i, " ".join(pool[(i + j) % 8] for j in range(12)), "en")
         for i in range(200)],
        "doc_id long, text string, lang string",
    )

    for fn in (dedup.containment_candidate_estimate,
               dedup.ngram_jaccard_candidate_estimate):
        exact = fn(docs, threshold=0.8, n=3)
        assert fn(docs, threshold=0.8, n=3, sample_fraction=1.0) == exact
        sampled = fn(docs, threshold=0.8, n=3, sample_fraction=0.5, seed=7)
        # deterministic (seeded); the band is loose on purpose — the
        # claim is "prices the join", not "reproduces it to the row"
        assert exact / 4 <= sampled <= exact * 4
        with pytest.raises(ValueError):
            fn(docs, threshold=0.8, n=3, sample_fraction=1.5)

    grams = dedup.distinct_grams_table(docs, n=3, block_cols=("lang",))
    with pytest.raises(ValueError):
        dedup.containment_candidate_estimate(
            docs, threshold=0.8, n=3, grams_tbl=grams, sample_fraction=0.5
        )


def test_sampled_probe_that_saw_nothing_raises_not_zero(spark):
    """ADVICE r10 (dedup.py:383): a sampled probe whose Bernoulli
    sample produced NO grams must raise instead of returning an
    extrapolated 0 — auto-n would read that 0 as 'payable' and
    green-light a possibly saturated gram size off a probe that saw
    nothing. A genuinely unshingleable corpus (empty, or every text
    shorter than n) still returns a true 0 under sampling, and the
    exact (unsampled) probe's 0 stays a plain 0."""
    from yat_geo_db_spark.pipelines import dedup

    docs = spark.createDataFrame(
        [(i, "alpha bravo carol delta echos fotox golfy hotel", "en")
         for i in range(6)],
        "doc_id long, text string, lang string",
    )
    for fn in (dedup.containment_candidate_estimate,
               dedup.ngram_jaccard_candidate_estimate):
        # fraction so small the seeded sample is empty -> blind probe
        with pytest.raises(ValueError, match="saw no grams"):
            fn(docs, threshold=0.8, n=3, sample_fraction=1e-9, seed=7)
        # all texts shorter than n: 0 is TRUE at any fraction
        short = docs.select(
            "doc_id", F.substring("text", 1, 4).alias("text"), "lang"
        )
        assert fn(short, threshold=0.8, n=7, sample_fraction=0.5) == 0
        assert fn(short, threshold=0.8, n=7) == 0
        empty = docs.filter(F.lit(False))
        assert fn(empty, threshold=0.8, n=3, sample_fraction=0.5) == 0
    # auto-n surfaces the blind-probe error instead of green-lighting
    with pytest.raises(ValueError, match="saw no grams"):
        dedup.containment_auto_n(
            docs, threshold=0.8, sample_fraction=1e-9, seed=7
        )


def test_auto_n_sampled_matches_full_direction(spark):
    """auto-n driven by sampled probes still lands past the saturated
    gram sizes on a dense corpus (budget compares against the FULL doc
    count, estimates extrapolate by 1/f²)."""
    from yat_geo_db_spark.pipelines import dedup

    pool = ["alpha", "bravo", "carol", "delta", "echos", "fotox"]
    dense = spark.createDataFrame(
        [(i, " ".join(pool[(i + j) % 6] for j in range(12)), "en")
         for i in range(60)],
        "doc_id long, text string, lang string",
    )
    n_full, _ = dedup.containment_auto_n(
        dense, threshold=0.8, per_doc_budget=8.0
    )
    n_samp, est_samp = dedup.containment_auto_n(
        dense, threshold=0.8, per_doc_budget=8.0, sample_fraction=0.5,
        seed=7,
    )
    assert n_full > 3
    assert n_samp > 3  # the sampled probe sees the same saturation
    assert est_samp >= 0
    nj_samp, _ = dedup.ngram_jaccard_auto_n(
        dense, threshold=0.5, per_doc_budget=8.0, sample_fraction=0.5,
        seed=7,
    )
    assert nj_samp > 3


def test_candidate_estimates_empty_and_short_corpus(spark):
    """The n_groups==0 branch (decimal-sum rewrite): a corpus whose
    texts are all shorter than the gram size yields zero prefix
    entries — both estimators must return 0, not raise and not
    misread the NULL decimal sum as overflow."""
    from yat_geo_db_spark.pipelines import dedup

    docs = spark.createDataFrame(
        [(1, "ab", "en"), (2, "x", "en")],
        "doc_id long, text string, lang string",
    )
    assert dedup.containment_candidate_estimate(docs, 0.8, n=3) == 0
    assert dedup.ngram_jaccard_candidate_estimate(docs, 0.5, n=3) == 0


def test_registry_shuffle_row_takes_exploded_route(spark):
    """VERDICT r11 task 1: the new pipe_dedup_containment_shuffle
    registry row must actually EXECUTE the exploded/bloom verify plan
    (no array column through any Exchange) and emit byte-identical
    pairs to the broadcast registry twin — the driver hashes its
    output against the same oracle, this test pins the plan shape the
    driver cannot see."""
    from yat_geo_db_spark.queries.pipeline_queries import (
        q_dedup_containment,
        q_dedup_containment_shuffle,
    )

    sf_dir = "/root/testdata/sf0.001"
    shuffle_df = q_dedup_containment_shuffle(spark, sf_dir)
    broadcast_df = q_dedup_containment(spark, sf_dir)
    got_s = sorted(map(tuple, shuffle_df.collect()))
    got_b = sorted(map(tuple, broadcast_df.collect()))
    assert got_s and got_s == got_b
    assert _array_carrying_exchanges(shuffle_df) == []
    # the broadcast twin carries its gram arrays only through
    # BroadcastExchange (one copy per executor, never per-pair)
    assert all(
        node.startswith("BroadcastExchange")
        for node, _, _ in _array_carrying_exchanges(broadcast_df)
    )
    spark.catalog.clearCache()


def test_prefix_df_dictionary_broadcast_gated_by_ceiling(spark):
    """Round-12 extreme-panel finding: the prefix table's gram-df
    dictionary is bounded by VOCABULARY, which a copy-unique-vocab
    corpus grows with the corpus — the unconditional broadcast OOM'd
    the driver at 100x. The dictionary must broadcast under the
    session ceiling and shuffle-join past it (same gram key as the
    candidate join), with identical output either way."""
    random.seed(47)
    pool = [f"w{i:02d}" for i in range(40)]
    rows = [
        (i, " ".join(pool[random.randrange(40)] for _ in range(20)), "en")
        for i in range(60)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )

    def df_join_is_broadcast(prefix_df) -> bool:
        plan = prefix_df._jdf.queryExecution().executedPlan().toString()
        # the df join is the only join in the prefix plan
        return "BroadcastHashJoin" in plan

    p_bc = dedup.jaccard_prefix_table(docs, 0.5, n=7)
    assert df_join_is_broadcast(p_bc)
    got_bc = sorted(map(tuple, p_bc.collect()))

    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        p_sh = dedup.jaccard_prefix_table(docs, 0.5, n=7)
        assert not df_join_is_broadcast(p_sh)
        assert sorted(map(tuple, p_sh.collect())) == got_bc
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    spark.catalog.clearCache()


def test_prefix_df_gate_measures_utf8_bytes_and_releases_cache(spark):
    """ADVICE r12: (a) the gate must price MEASURED UTF-8 bytes, not
    1 byte/char — a CJK corpus's grams are 3x the char count, and the
    forced F.broadcast() hint bypasses Spark's own size check; (b) a
    public-API call (no index_frames) must not leave persisted frames
    behind."""
    import random as _r
    _r.seed(48)
    # CJK-ish corpus: every char is 3 UTF-8 bytes
    pool = [chr(0x4E00 + i) for i in range(200)]
    rows = [
        (i, "".join(_r.choice(pool) for _ in range(40)), "zh")
        for i in range(50)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )

    def df_join_is_broadcast(prefix_df) -> bool:
        plan = prefix_df._jdf.queryExecution().executedPlan().toString()
        return "BroadcastHashJoin" in plan

    # vocabulary of 3-grams over 50x40 chars ≈ ~1.9k distinct grams →
    # chars estimate vocab*(3+8) ≈ 21 KiB, measured 3-byte estimate
    # vocab*(9+8) ≈ 33 KiB. A threshold BETWEEN the two must take the
    # shuffle route under byte-measuring (old char math would broadcast).
    jsc = spark.sparkContext._jsc.sc()
    persisted_before = jsc.getPersistentRDDs().size()
    grams = dedup.distinct_grams_table(docs, n=3)
    from pyspark.sql import functions as F
    vocab, bts = (
        grams.select(F.explode("grams").alias("g")).distinct()
        .agg(F.count(F.lit(1)), F.sum(F.octet_length("g"))).first()
    )
    assert bts == vocab * 9  # 3 chars x 3 bytes — the 3x regime
    char_est = vocab * (3 + 8)
    byte_est = bts + vocab * 8
    assert char_est < byte_est
    mid = (char_est + byte_est) // 2
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(mid))
        p = dedup.jaccard_prefix_table(docs, 0.5, n=3)
        assert not df_join_is_broadcast(p), (
            "gate admitted a broadcast the byte measure prices over "
            f"the ceiling (chars {char_est} < {mid} < bytes {byte_est})"
        )
        # and with the ceiling above the MEASURED bytes it broadcasts
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(byte_est + 1024)
        )
        p2 = dedup.jaccard_prefix_table(docs, 0.5, n=3)
        assert df_join_is_broadcast(p2)
        assert sorted(map(tuple, p.collect())) == sorted(
            map(tuple, p2.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    # (b) no persisted frames linger for the public (no index_frames) path
    assert jsc.getPersistentRDDs().size() <= persisted_before, (
        "public jaccard_prefix_table call leaked persisted frames"
    )
    spark.catalog.clearCache()


def test_verify_preflight_refusal_names_payable_alternative(spark):
    """VERDICT r12 task 5: an unpayable verify must raise an error that
    PRICES the refused join and names ≥1 payable alternative the
    library ships — a higher gram size when one fits the budget, else
    the MinHash-LSH route."""
    import pytest as _pytest

    # small-vocabulary corpus: 3-grams are saturated (every doc shares
    # most grams → huge candidate estimate), longer grams individuate
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 9}" for j in range(30)), "en")
        for i in range(80)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    est3 = dedup.containment_candidate_estimate(docs, 0.8, n=3)
    assert est3 > 0
    # budget below the n=3 projection → refusal
    budget = est3 * dedup.VERIFY_BYTES_PER_CAND // 2
    with _pytest.raises(dedup.VerifyBudgetExceeded) as ei:
        dedup.containment_pairs(
            docs, threshold=0.8, n=3, shuffle_budget_bytes=budget
        )
    msg = str(ei.value)
    assert "GiB" in msg and "refused" in msg
    # must name a payable alternative: either a priced higher n or the
    # minhash route; BOTH paths must mention minhash_lsh_pairs
    assert "minhash_lsh_pairs" in msg
    if "raise the gram size to n=" in msg:
        import re as _re
        n2 = int(_re.search(r"gram size to n=(\d+)", msg).group(1))
        est2 = dedup.containment_candidate_estimate(docs, 0.8, n=n2)
        assert est2 * dedup.VERIFY_BYTES_PER_CAND <= budget, (
            "named alternative is not actually payable"
        )
    # a payable budget passes through with identical output
    ok = dedup.containment_pairs(
        docs, threshold=0.8, n=3,
        shuffle_budget_bytes=est3 * dedup.VERIFY_BYTES_PER_CAND + 1,
    )
    plain = dedup.containment_pairs(docs, threshold=0.8, n=3)
    assert sorted(map(tuple, ok.collect())) == sorted(
        map(tuple, plain.collect())
    )
    spark.catalog.clearCache()


def test_verify_preflight_jaccard_route(spark):
    """The Jaccard twin refuses with the same priced-alternative
    contract."""
    import pytest as _pytest

    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 8}" for j in range(25)), "en")
        for i in range(60)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    est3 = dedup.ngram_jaccard_candidate_estimate(docs, 0.5, n=3)
    assert est3 > 0
    with _pytest.raises(dedup.VerifyBudgetExceeded, match="minhash_lsh_pairs"):
        dedup.ngram_jaccard_pairs(
            docs, threshold=0.5, n=3,
            shuffle_budget_bytes=est3 * dedup.VERIFY_BYTES_PER_CAND // 2,
        )
    spark.catalog.clearCache()


def test_verify_preflight_sampled_probe_threads_through(spark):
    """preflight_sample_fraction must reach BOTH estimate passes — the
    initial pricing and the refusal path's higher-n repricing — because
    the refusal regime (huge corpus) is exactly where the exact probe's
    per-n window sort stops fitting executor memory and the sampled
    cost model is the designed mechanism (the extreme panel's ≥64×
    protocol). Seen fractions are recorded via monkeypatched estimate /
    auto-n seams; the refusal contract itself must be unchanged."""
    import pytest as _pytest

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 9}" for j in range(30)), "en")
        for i in range(80)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    seen = {"est": [], "auto": []}
    real_est = dedup.containment_candidate_estimate
    real_auto = dedup.containment_auto_n

    def spy_est(*a, **kw):
        seen["est"].append(kw.get("sample_fraction"))
        return real_est(*a, **kw)

    def spy_auto(*a, **kw):
        seen["auto"].append(kw.get("sample_fraction"))
        return real_auto(*a, **kw)

    est3 = real_est(docs, 0.8, n=3)
    budget = est3 * dedup.VERIFY_BYTES_PER_CAND // 2
    orig = (dedup.containment_candidate_estimate, dedup.containment_auto_n)
    dedup.containment_candidate_estimate = spy_est
    dedup.containment_auto_n = spy_auto
    try:
        with _pytest.raises(dedup.VerifyBudgetExceeded):
            dedup.containment_pairs(
                docs, threshold=0.8, n=3, shuffle_budget_bytes=budget,
                preflight_sample_fraction=0.5,
            )
    finally:
        (dedup.containment_candidate_estimate,
         dedup.containment_auto_n) = orig
    # the spy sees the initial estimate AND every per-grid-step
    # estimate the repricing's auto-n runs — ALL must carry the fraction
    assert seen["est"] and set(seen["est"]) == {0.5}, seen
    assert seen["auto"] == [0.5], seen
    # default stays exact-probe (None) end to end
    seen = {"est": [], "auto": []}
    dedup.containment_candidate_estimate = spy_est
    dedup.containment_auto_n = spy_auto
    try:
        with _pytest.raises(dedup.VerifyBudgetExceeded):
            dedup.containment_pairs(
                docs, threshold=0.8, n=3, shuffle_budget_bytes=budget,
            )
    finally:
        (dedup.containment_candidate_estimate,
         dedup.containment_auto_n) = orig
    assert seen["est"] and set(seen["est"]) == {None}, seen
    assert seen["auto"] == [None], seen
    spark.catalog.clearCache()


def test_auto_n_path_threads_fraction_and_reuses_sweep_estimate(spark):
    """Round-13 review: with n=None + a budget guard, (a) the auto-n
    sweep's probes must honor preflight_sample_fraction — the at-scale
    caller that can't afford exact estimate probes for the pre-flight
    can't afford them for the sweep either — and (b) the pre-flight
    must REUSE the estimate the sweep already produced for the selected
    n instead of paying the same estimate pass twice (pinned: zero
    calls to containment_candidate_estimate when the stubbed sweep
    supplies one)."""
    import pytest as _pytest

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 9}" for j in range(30)), "en")
        for i in range(40)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    calls = {"est": 0}
    seen_auto = []
    real_est = dedup.containment_candidate_estimate

    def spy_est(*a, **kw):
        calls["est"] += 1
        return real_est(*a, **kw)

    def fake_auto(*a, **kw):
        seen_auto.append(kw.get("sample_fraction"))
        return 7, 1234

    orig = (dedup.containment_candidate_estimate, dedup.containment_auto_n)
    dedup.containment_candidate_estimate = spy_est
    dedup.containment_auto_n = fake_auto
    try:
        with _pytest.raises(dedup.VerifyBudgetExceeded):
            dedup.containment_pairs(
                docs, threshold=0.8, n=None,
                shuffle_budget_bytes=1234 * dedup.VERIFY_BYTES_PER_CAND // 2,
                preflight_sample_fraction=0.5,
            )
    finally:
        (dedup.containment_candidate_estimate,
         dedup.containment_auto_n) = orig
    # every auto call — the initial sweep AND the refusal repricing —
    # carried the fraction; the sweep's estimate was reused, never
    # recomputed
    assert seen_auto and set(seen_auto) == {0.5}, seen_auto
    assert calls["est"] == 0, calls
    spark.catalog.clearCache()
