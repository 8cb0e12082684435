"""Real byte-pair encoding — trained ON the cluster, applied at scan speed.

Generalizes the brief's "BPE-ish regex token count" to an actual BPE:
`bpe_train` learns merge rules from the corpus, `bpe_encode` applies them.

Scale shape (the part that matters at 100 TB): BPE statistics are
WORD-frequency statistics — so the corpus-scale work is exactly ONE token
explode + hash aggregation into a (word, freq) table, which is
VOCABULARY-bounded (Heaps' law: sublinear in corpus size), and every
training iteration thereafter runs on that small table: pair-count
aggregation, one-row argmax collect, merge application, localCheckpoint to
cut the growing lineage (the kmeans/logreg pattern). The corpus is never
re-scanned during training.

Determinism: ties in pair frequency break on (count desc, left asc,
right asc — binary string order, identical on Spark and DuckDB);
training is therefore a pure function of the corpus and is pinned
against a pure-Python reference in tests/test_tokenize.py AND replayed
end-to-end by a DuckDB oracle (queries.pipeline_queries._text_bpe_sql:
unrolled MATERIALIZED training rounds; the greedy within-word merge is
a left fold — equal to the scan-and-skip reference because a
just-merged symbol is strictly longer than `left` and cannot
re-trigger within its round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

#: end-of-word sentinel (classic Sennrich-style BPE operates within words)
EOW = "</w>"


def _chars_with_eow(w):
    """Column: word string -> array of single chars + EOW sentinel.
    Empty words (double spaces) guard explicitly: Spark's sequence(1, 0)
    would otherwise step BACKWARD and fabricate two empty symbols."""
    return F.when(F.length(w) == 0, F.array(F.lit(EOW))).otherwise(
        F.concat(
            F.transform(
                F.sequence(F.lit(1), F.length(w)),
                lambda i: F.substring(w, i, 1),
            ),
            F.array(F.lit(EOW)),
        )
    )


def _apply_merge(syms, left: str, right: str):
    """Column: replace every non-overlapping (left, right) adjacency in
    `syms` with the concatenation, scanning left-to-right — an aggregate
    fold whose accumulator is the rebuilt array (matches the sequential
    semantics of the reference Python implementation)."""
    # non-overlapping falls out of the fold: once a pair merges, the
    # accumulator's last element is `left+right`, which is strictly longer
    # than `left` and so can't trigger again ("aaa" + (a,a) -> ["aa","a"])
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_freq_table(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq): the one corpus-scale pass of BPE training."""
    from yat_geo_db_spark.pipelines.text import tokens_col

    return (
        documents.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train(
    documents: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merge rules from the corpus. Returns
    [(left, right, pair_freq)] in training order. See module doc for the
    scale shape and determinism contract."""
    wf = word_freq_table(documents, text_col)
    state = wf.select(
        "freq", _chars_with_eow(F.col("w")).alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        # single-symbol rows contribute no pairs AND would crash the
        # explode: sequence(1, 0) steps BACKWARD to [1, 0] and
        # element_at(syms, 0/2) is out of bounds. Hit by empty words
        # (['</w>']) and by any word a merge fully collapses.
        pairs = state.filter(F.size("syms") > 1).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i).alias("l"),
                        F.element_at(F.col("syms"), i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        merges.append((left, right, int(cnt)))
        state = state.select(
            "freq", _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


def bpe_apply_py(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Reference semantics for one word: apply each merge rule IN TRAINING
    ORDER, each as a full left-to-right non-overlapping pass. Used by the
    encoder workers and the golden tests."""
    syms = list(word) + [EOW]
    for left, right, _ in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == left
                and syms[i + 1] == right
            ):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    documents: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize each document with the learned merges: (id,
    n_bpe_tokens, token_digest) — digest = polynomial fold over the
    subword sequence, so any tokenization drift is visible, not just
    counts. Arrow-batched mapInPandas; the merge table ships by value in
    the closure (it is n_merges tuples); per-word results are memoized
    per batch (Zipf: a few thousand distinct words cover most tokens)."""
    from yat_geo_db_spark.pipelines.text import FNV_BASE, FNV_MOD

    mlist = list(merges)

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = bpe_apply_py(w, mlist)
            return got

        for pdf in batches:
            ids, counts, digests = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in (t or "").split(" "):
                    toks.extend(enc_word(w))
                d = 0
                for s in toks:
                    for ch in s:
                        d = (d * FNV_BASE + ord(ch)) % FNV_MOD
                    d = (d * FNV_BASE + 1) % FNV_MOD  # token boundary mark
                ids.append(i)
                counts.append(len(toks))
                digests.append(d)
            yield pd.DataFrame(
                {id_col: ids, "n_bpe_tokens": counts, "token_digest": digests}
            )

    return documents.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, n_bpe_tokens long, token_digest long"
    )
