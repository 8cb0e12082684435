"""BPE training/encoding pinned against a pure-Python reference — the
correctness evidence for the rows-only registry entry (no SQL engine can
fold the nested-list merge loop for a value-hash oracle)."""

from __future__ import annotations

import pyspark.sql.functions as F

from yat_geo_db_spark.pipelines.tokenize import (
    EOW,
    bpe_apply_py,
    bpe_encode,
    bpe_train,
    word_freq_table,
)
from yat_geo_db_spark.testdata import load_table

SF = "/root/testdata/sf0.001"


def _py_train(word_freqs: dict[str, int], n_merges: int):
    state = {w: (list(w) + [EOW], f) for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in state.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), cnt = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((left, right, cnt))
        for w, (syms, f) in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = (out, f)
    return merges


def test_bpe_train_matches_python_reference(spark):
    docs = load_table(spark, SF, "documents")
    wf = {
        r["w"]: r["freq"] for r in word_freq_table(docs).collect()
    }
    got = bpe_train(docs, n_merges=8)
    want = _py_train(wf, 8)
    assert got == want
    # merges are real (multi-char units form), and counts are plausible
    assert all(cnt > 1 for _, _, cnt in got)
    assert any(len(left) > 1 or len(right) > 1 for left, right, _ in got[2:])


def test_apply_merge_column_matches_python_pass(spark):
    from yat_geo_db_spark.pipelines.tokenize import _apply_merge

    words = ["aaa", "aaaa", "abab", "banana", "a", ""]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    from yat_geo_db_spark.pipelines.tokenize import _chars_with_eow

    for left, right in [("a", "a"), ("a", "b"), ("an", "a"), ("a", EOW)]:
        base = df.select(
            "w", _chars_with_eow(F.col("w")).alias("syms")
        )
        got = {
            r["w"]: list(r["out"])
            for r in base.select(
                "w", _apply_merge(F.col("syms"), left, right).alias("out")
            ).collect()
        }
        for w in words:
            want = bpe_apply_py(w, [(left, right, 0)])
            # bpe_apply_py applies from raw chars; mirror the single pass
            assert got[w] == want, (w, left, right)


def test_bpe_encode_matches_python_and_is_reversible_on_counts(spark):
    # orderBy before limit: a bare limit(50) re-executes per ACTION and
    # is free to pick different rows each time (whichever tasks finish
    # first) — this test runs two actions over `docs` and flaked on
    # exactly that under full-suite load (r10)
    docs = load_table(spark, SF, "documents").orderBy("doc_id").limit(50)
    merges = bpe_train(load_table(spark, SF, "documents"), n_merges=6)
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    for r in docs.collect():
        toks = []
        for w in r["text"].split(" "):
            toks.extend(bpe_apply_py(w, merges))
        assert out[r["doc_id"]]["n_bpe_tokens"] == len(toks)
        # merging never changes total character mass (minus EOW marks)
        n_words = len(r["text"].split(" "))
        chars = sum(len(t) for t in toks) - n_words * len(EOW)
        assert chars == len(r["text"]) - (n_words - 1)


def test_bpe_train_survives_empty_and_collapsed_words(spark):
    """Review regression: single-symbol rows (['</w>'] from empty words,
    or fully-collapsed short words) must not crash the pair explode
    (sequence(1,0) steps backward)."""
    docs = spark.createDataFrame(
        [(1, "a  b"), (2, "aa aa aa"), (3, ""), (4, "a a a a")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=6)
    assert merges  # trained through collapses without error
    out = bpe_encode(docs, merges).collect()
    assert {r["doc_id"] for r in out} == {1, 2, 3, 4}
