"""Property-based checks (hypothesis) for the scalar kernels that must
agree across engines: the pure-python Damerau-Levenshtein vs DuckDB's,
trigram/tversky identities, and the rolling-hash fold vs its SQL twin."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yat_geo_db_spark.geo.fuzzy import (
    _damerau_levenshtein,
    clean_entity,
    ngrams_list,
)
from yat_geo_db_spark.pipelines.text import FNV_BASE, FNV_MOD

_short_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=12
)


@st.composite
def _two_strings(draw):
    return draw(_short_text), draw(_short_text)


@given(_two_strings())
@settings(max_examples=150, deadline=None)
def test_damerau_matches_duckdb(pair):
    s1, s2 = pair
    got = _damerau_levenshtein(s1, s2)
    want = duckdb.sql(
        "SELECT damerau_levenshtein(?, ?)", params=[s1, s2]
    ).fetchone()[0]
    assert got == want


@given(_two_strings())
@settings(max_examples=100, deadline=None)
def test_damerau_is_a_metric(pair):
    s1, s2 = pair
    d = _damerau_levenshtein(s1, s2)
    assert d == _damerau_levenshtein(s2, s1)          # symmetry
    assert (d == 0) == (s1 == s2)                      # identity
    assert d <= max(len(s1), len(s2))                  # bounded


@given(_short_text)
@settings(max_examples=100, deadline=None)
def test_ngrams_count_identity(s):
    grams = ngrams_list(s)
    assert len(grams) == max(0, len(s) - 2)
    assert all(len(g) == 3 for g in grams)


@given(_short_text)
@settings(max_examples=100, deadline=None)
def test_clean_entity_idempotent(s):
    once = clean_entity(s)
    assert clean_entity(once) == once
    assert all(c.isalnum() or c == " " for c in once)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=40))
@settings(max_examples=80, deadline=None)
def test_rolling_hash_matches_duckdb(s):
    acc = 0
    for ch in s:
        acc = (acc * FNV_BASE + ord(ch)) % FNV_MOD
    want = duckdb.sql(
        "SELECT list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(1, length(?) + 1), "
        "i -> CAST(ascii(substr(?, CAST(i AS INT), 1)) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 1000000007)",
        params=[s, s],
    ).fetchone()[0]
    assert acc == (want if want is not None else 0)


# --------------------------------------------------------------------------
# Prefix-filter losslessness (the math behind dedup.ngram_jaccard_pairs):
# for ANY corpus and threshold, every pair with J >= t must survive the
# candidate join — including the length and positional filters. This mirrors
# the Spark join condition exactly (rare-first global order, per-doc prefix
# |g| - ceil(t|g|) + 1, t|x| <= |y| <= |x|/t, overlap upper bound >= alpha).
# --------------------------------------------------------------------------

import math as _math
from collections import Counter as _Counter

_gram = st.sampled_from([f"g{i}" for i in range(18)])
_doc = st.frozensets(_gram, min_size=1, max_size=12)
_corpus = st.lists(_doc, min_size=2, max_size=10)
_threshold = st.sampled_from([0.3, 0.5, 0.6, 0.8])


def _prefix_candidates(docs, t):
    """Pure-python mirror of jaccard_prefix_table + the join condition."""
    df = _Counter(g for d in docs for g in set(d))
    order = {g: (df[g], g) for g in df}
    ranked = [
        {g: r + 1 for r, g in enumerate(sorted(d, key=order.__getitem__))}
        for d in docs
    ]
    prefixes = []
    for d, rnk in zip(docs, ranked):
        plen = len(d) - _math.ceil(t * len(d)) + 1
        prefixes.append({g for g, r in rnk.items() if r <= plen})
    cands = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            szx, szy = len(docs[i]), len(docs[j])
            if not (szy >= _math.ceil(t * szx) and szy <= _math.floor(szx / t)):
                continue
            alpha = _math.ceil(t / (1 + t) * (szx + szy))
            for g in prefixes[i] & prefixes[j]:
                ub = min(szx - ranked[i][g], szy - ranked[j][g]) + 1
                if ub >= alpha:
                    cands.add((i, j))
                    break
    return cands


@given(
    st.frozensets(_gram, max_size=18),
    st.frozensets(_gram, max_size=18),
    st.sampled_from([4, 8, 16, 64]),
)
@settings(max_examples=300, deadline=None)
def test_bloom_miss_bound_lossless_any_bucketing(a, b, bits):
    """The gram-bloom verify prefilter (dedup._gram_bloom_table /
    _bloom_miss_lower_bound) rests on: for ANY map of grams to single
    bit positions, popcount(bloom_A & ~bloom_B) ≤ |A \\ B| — each
    A-only bit is witnessed by ≥1 distinct A-gram absent from B, and
    distinct bits witness distinct grams. Deliberately tiny widths
    (down to 4 bits) force heavy collisions, the regime where an
    unsound bound would overcount; A ⊆ B must always bound to exactly
    0 (a verbatim containment can never be pruned). The Spark-side
    deterministic twin (test_dedup_blocking) ties the real
    xxhash64/4096-bit implementation to exact set differences."""
    def bloom(s):
        out = 0
        for g in s:
            out |= 1 << (hash(g) % bits)
        return out

    bound = bin(bloom(a) & ~bloom(b) & ((1 << bits) - 1)).count("1")
    assert bound <= len(a - b), (sorted(a), sorted(b), bits)
    if a <= b:
        assert bound == 0


@given(_corpus, _threshold)
@settings(max_examples=250, deadline=None)
def test_prefix_filter_is_lossless(docs, t):
    cands = _prefix_candidates(docs, t)
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(docs[i] & docs[j])
            union = len(docs[i] | docs[j])
            if union and inter / union >= t:
                assert (i, j) in cands, (docs[i], docs[j], t)


def test_wav_codec_round_trip_property():
    """encode_wav ∘ decode_wav is the identity on arbitrary int16 sample
    vectors and rates — the property a real codec pair must satisfy (no
    Spark involved; the distributed path reuses exactly these kernels)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from yat_geo_db_spark.pipelines.multimodal import decode_wav, encode_wav

    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767), max_size=300
        ),
        st.sampled_from([8000, 16000, 44100]),
    )
    @settings(max_examples=60, deadline=None)
    def check(samples, rate):
        got_rate, got = decode_wav(encode_wav(samples, rate))
        assert got_rate == rate
        assert got.tolist() == samples
        assert np.asarray(got).dtype == np.dtype("<i2") or got.dtype == np.int16

    check()


# ---------------------------------------------------------------------------
# BPE merge-pass law: the Column fold == the sequential Python pass
# ---------------------------------------------------------------------------

_bpe_word = st.text(alphabet="ab", min_size=0, max_size=12)


@given(
    st.lists(_bpe_word, min_size=1, max_size=8),
    st.sampled_from([("a", "a"), ("a", "b"), ("b", "a"), ("aa", "b"),
                     ("ab", "ab"), ("a", "</w>")]),
)
@settings(max_examples=60, deadline=None)
def test_bpe_apply_merge_fold_matches_python(spark, words, merge):
    """Randomized over adversarial two-letter words (overlap runs like
    'aaaa' included): one _apply_merge Column pass over char+EOW symbols
    must equal bpe_apply_py's sequential single-merge pass."""
    import pyspark.sql.functions as F

    from yat_geo_db_spark.pipelines.tokenize import (
        _apply_merge,
        _chars_with_eow,
        bpe_apply_py,
    )

    left, right = merge
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)],
                               "i long, w string")
    got = {
        r["i"]: list(r["out"])
        for r in df.select(
            "i",
            _apply_merge(
                _chars_with_eow(F.col("w")), left, right
            ).alias("out"),
        ).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == bpe_apply_py(w, [(left, right, 0)]), (w, merge)


# ---------------------------------------------------------------------------
# Candidate-estimate law: the distributed cost model == the Python twin
# ---------------------------------------------------------------------------

_est_doc = st.text(alphabet="abcx", min_size=0, max_size=14)


def _py_prefix_entries(rows, t, n):
    """Pure-Python twin of jaccard_prefix_table over (id, text, block)
    rows: rarest-first (global df, gram) order, FP-epsilon ceil —
    returns [(block, gram)] with one entry per kept (doc, gram)."""
    import math

    def grams(txt):
        return sorted({txt[i:i + n] for i in range(len(txt) - n + 1)})

    df_global = {}
    for _, txt, _b in rows:
        for g in grams(txt):
            df_global[g] = df_global.get(g, 0) + 1
    entries = []
    for _, txt, b in rows:
        gs = sorted(grams(txt), key=lambda g: (df_global[g], g))
        sz = len(gs)
        if sz == 0:
            continue
        plen = sz - math.ceil(t * sz - 1e-6) + 1
        entries.extend((b, g) for g in gs[:plen])
    return entries


@given(
    st.lists(_est_doc, min_size=1, max_size=7),
    st.sampled_from([0.5, 0.7, 0.8]),
    st.sampled_from([2, 3]),
)
@settings(max_examples=12, deadline=None)
def test_candidate_estimates_match_python_twin(spark, texts, t, n):
    """Randomized over small-alphabet corpora (shared grams, empty and
    sub-n texts included): both distributed cost models must equal the
    independent pure-Python computation of their definitions —
    Σ C(prefix_count, 2) over (block, gram) for the symmetric join,
    Σ (df_block − 1) over prefix entries for the directed one."""
    from collections import Counter

    from yat_geo_db_spark.pipelines import dedup

    rows = [(i, txt, "en" if i % 2 else "de")
            for i, txt in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")

    entries = _py_prefix_entries(rows, t, n)
    pc = Counter(entries)
    want_j = sum(c * (c - 1) // 2 for c in pc.values())

    df_block = Counter()
    for _, txt, b in rows:
        for g in {txt[i:i + n] for i in range(len(txt) - n + 1)}:
            df_block[(b, g)] += 1
    want_c = sum(df_block[e] - 1 for e in entries)

    got_j = dedup.ngram_jaccard_candidate_estimate(
        docs, threshold=t, n=n, block_cols=("lang",))
    got_c = dedup.containment_candidate_estimate(
        docs, threshold=t, n=n, block_cols=("lang",))
    assert got_j == want_j, (texts, t, n)
    assert got_c == want_c, (texts, t, n)
