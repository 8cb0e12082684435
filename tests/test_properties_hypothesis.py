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
