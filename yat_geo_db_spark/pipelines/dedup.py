"""Deduplication for training corpora — exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine. Generalizes the reference's trigram machinery
(F1/F2/F10/F12) from interactive search to corpus-scale self-join.

Scale shapes:
- exact: one hash-aggregate shuffle on a digest — the cheapest possible form.
- ngram-Jaccard: candidate generation MUST be blocked (here: language +
  length bucket; at 100 TB: MinHash bands) — never a blind O(N²) cross join.
- MinHash+LSH: shingle → K permuted min-hashes → band buckets → within-bucket
  pairs → exact-Jaccard verify. Shuffles: one per band-bucket join; band
  width trades recall vs candidate volume.
- SimHash: 64-bit signature from token hashes; near-dup = small Hamming
  distance within LSH-style prefix blocks.
All signatures are pure Column expressions (deterministic, oracle-checkable);
no Python in the row path.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from yat_geo_db_spark.pipelines.text import (
    FNV_BASE,
    FNV_MOD,
    token_shingles_col as tokens_shingles,
    tokens_col,
)

#: MinHash permutation parameters — fixed seed so Spark & oracle SQL agree.
_rng = random.Random(42)
MINHASH_PERMS: list[tuple[int, int]] = [
    (_rng.randrange(1, FNV_MOD - 1), _rng.randrange(0, FNV_MOD - 1))
    for _ in range(16)
]
MINHASH_BANDS = 4  # 4 bands × 4 rows

#: 48 bits: wide enough that same-language (shared-vocabulary) docs spread
#: out — at 32 bits the fixture corpus collapses onto near-identical sigs
SIMHASH_BITS = 48

#: epsilon for the FP-safe PPJoin pruning bounds: large enough to absorb
#: double rounding on products of set sizes (≤ ~1e6) with an inexact
#: threshold, far smaller than the 1-unit integer gap the bounds guard
_FP_EPS = 1e-6

#: Multiplicative scramble constants (Knuth/xxHash primes, reduced mod
#: FNV_MOD). shingle_hash yields < FNV_MOD ≈ 2^30, so its raw bits can't
#: fill 48 signature positions — and a polynomial hash has no avalanche, so
#: near-identical tokens (shared prefixes) produce CONTIGUOUS hash values
#: whose high bits are constant. Each simhash bit therefore votes on a bit
#: of (h * K) % FNV_MOD instead of h itself: multiplication by a large odd
#: constant mod M spreads contiguous inputs across the full range, and two
#: independent constants yield 2 × 24 usable well-mixed bits.
SIMHASH_SCRAMBLE_1 = 0x9E3779B1 % FNV_MOD
SIMHASH_SCRAMBLE_2 = 0x85EBCA77 % FNV_MOD


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Character shingles (duplicates kept; wrap in array_distinct for sets)."""
    return F.when(F.length(col) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(col) - (n - 1)),
            lambda i: F.substring(col, i, n),
        )
    )


def shingle_hash(g: Column) -> Column:
    """Polynomial hash of a short shingle string → long (same fold as
    text.fingerprint_col; identical in DuckDB via list_reduce)."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(g)),
        lambda i: F.ascii(F.substring(g, i, 1)).cast("long"),
    )
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: (acc * FNV_BASE + c) % FNV_MOD
    )


def jaccard_col(g1: Column, g2: Column) -> Column:
    """Exact set Jaccard of two gram arrays, 6-dp rounded — THE verify
    expression every candidate generator funnels into (one definition so
    the rounding/empty-set policy can never silently diverge between the
    oracle-checked variants)."""
    inter = F.size(F.array_intersect(g1, g2)).cast("double")
    union = F.size(g1).cast("double") + F.size(g2).cast("double") - inter
    return F.round(
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6
    )


def _finish_index_plan(result: DataFrame, *index_frames: DataFrame,
                       materialize: bool) -> DataFrame:
    """The caching contract shared by every pair-join builder here
    (ADVICE r9): builders persist + eagerly materialize their index
    frames (grams / prefix / band / signature tables) because the
    candidate self-join's concurrent map stages would otherwise race a
    cold cache and each recompute the index (~2x, measured — see
    ngram_jaccard_pairs). With ``materialize=False`` (the default) the
    returned frame is LAZY and its lineage references those caches, so
    the CALLER owns the storage: consume the result, then release with
    ``spark.catalog.clearCache()`` (or keep it — repeated calls in one
    session reuse nothing across calls, so a long-lived session that
    loops over corpora should pass ``materialize=True``). With
    ``materialize=True`` the result — a bounded near-dup pair list —
    is computed NOW (localCheckpoint, executor-local storage that the
    ContextCleaner reclaims when the frame is garbage-collected) and
    every index cache is unpersisted before returning: nothing outlives
    the returned frame."""
    if not materialize:
        return result
    out = result.localCheckpoint(eager=True)
    for f in index_frames:
        f.unpersist()
    return out


def _parse_size_bytes(v: str) -> int:
    """Spark size-conf string → bytes ('67108864', '64MB', '10m', '-1').
    A bare number in spark.sql.autoBroadcastJoinThreshold is bytes."""
    s = str(v).strip().lower()
    for suf, mult in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("tb", 1 << 40),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40),
        ("b", 1),
    ):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * mult)
    return int(float(s))


def _materialize_grams_stats(grams_tbl: DataFrame, n: int) -> int:
    """Materialize a persisted grams table (the one eager job the index
    builders already paid as a bare count(); see ngram_jaccard_pairs)
    and return the estimated broadcast-side bytes of its (id, grams)
    projection: per gram the n UTF8 bytes + per-element array overhead,
    per doc the row/key overhead. The estimate prices the VERIFY
    join-back's build side so the broadcast-vs-exploded route can be
    decided deterministically instead of left to a runtime size guess
    over a not-yet-materialized cache."""
    row = grams_tbl.agg(
        F.count(F.lit(1)).alias("docs"),
        F.coalesce(F.sum(F.size("grams")), F.lit(0)).alias("grams"),
    ).collect()[0]  # bounded collect: two scalars
    # raw payload bytes (gram UTF8 data + a small per-doc overhead),
    # deliberately NOT counting per-element representation overhead:
    # the gate should err toward the broadcast fast-path, which the
    # cached columnar relation compresses well below raw anyway — the
    # exploded route's advantage only materializes when the table is
    # decisively past the ceiling (measured crossover: BENCHLOG r11)
    return int(row["grams"]) * n + int(row["docs"]) * 16


def _validate_verify(verify: str) -> None:
    """Reject an invalid ``verify`` BEFORE any cluster work: the pair
    builders call this at entry, so a typo costs a ValueError, not a
    full shingle pass + auto-n sweep + grams persist first."""
    if verify not in ("auto", "broadcast", "exploded"):
        raise ValueError(
            f"verify must be 'auto', 'broadcast' or 'exploded', got "
            f"{verify!r}"
        )


def _verify_route(spark, verify: str, est_bytes: int) -> str:
    """Resolve verify='auto' against the session's broadcast ceiling:
    at or under spark.sql.autoBroadcastJoinThreshold the array
    join-back broadcasts (cheapest by far); past it — or with
    broadcasting disabled (-1) — the exploded narrow verify takes
    over. 'broadcast'/'exploded' force the route (tests, callers who
    know their corpus)."""
    _validate_verify(verify)
    if verify in ("broadcast", "exploded"):
        return verify
    try:
        thr = _parse_size_bytes(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
    except Exception:
        thr = 10 << 20  # Spark's stock default
    return "broadcast" if thr > 0 and est_bytes <= thr else "exploded"


#: gram-bloom width for the shuffle-route verify prefilter: 4096 bits
#: as 64 flat long columns (flat, not an array — the shuffle-route
#: plan contract is that NO exchange carries an array column). Sizing:
#: the lossless prune needs E[set-only-in-A ∧ clear-in-B bits] to
#: exceed the allowed miss budget ((1−t)·|A| containment, |A|−α
#: Jaccard) on FALSE candidates; at 4096 bits a 640-gram doc fills 14%
#: and a 1300-gram doc 27%, giving ≈ 4096·0.14·0.73 ≈ 420 prunable
#: bits against a t=0.8 budget of 128 — comfortable even for
#: ~2000-gram documents, at 512 B/row through the pair exchange (vs
#: the multi-KB arrays the prefilter exists to avoid). For documents
#: far beyond ~3000 distinct grams the bloom saturates and the prune
#: degrades GRACEFULLY (keeps everything; the exploded count stays
#: linear) — at those sizes raise the gram length instead (auto-n).
_BLOOM_WORDS = 64


def _gram_bloom_table(grams_tbl: DataFrame, id_col: str) -> DataFrame:
    """(_bid, _w0.._wN): per-doc 64·_BLOOM_WORDS-bit bloom of the
    distinct gram set — each gram sets exactly ONE bit
    (pmod(xxhash64, bits)), which
    is what makes the verify prune LOSSLESS: every bit set in A's
    bloom but clear in B's is witnessed by ≥ 1 distinct gram of A that
    CANNOT be in B (any B gram on that bit would have set it), and
    distinct bits witness distinct grams, so
    popcount(bloom_A & ~bloom_B) lower-bounds |A \\ B|. One linear
    explode + one map-side-combinable _BLOOM_WORDS-buffer bit_or
    aggregate."""
    pos = F.pmod(F.xxhash64("_g"), F.lit(64 * _BLOOM_WORDS))
    e = grams_tbl.select(
        F.col(id_col).alias("_bid"), F.explode("grams").alias("_g")
    ).select(
        "_bid",
        F.shiftright(pos, 6).cast("int").alias("_w"),
        # F.shiftleft only takes a literal bit count — build the
        # column-shifted mask as an expression
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(pmod("
            f"xxhash64(_g), {64 * _BLOOM_WORDS}), 64) AS INT))"
        ).alias("_b"),
    )
    return e.groupBy("_bid").agg(*[
        F.coalesce(
            F.bit_or(F.when(F.col("_w") == i, F.col("_b"))),
            F.lit(0).cast("long"),
        ).alias(f"_w{i}")
        for i in range(_BLOOM_WORDS)
    ])


def _bloom_miss_lower_bound(a_prefix: str, b_prefix: str):
    """Column: Σ_i popcount(a_i & ~b_i) — a LOWER bound on how many of
    A's distinct grams are absent from B (see _gram_bloom_table)."""
    terms = [
        F.bit_count(
            F.col(f"{a_prefix}{i}").bitwiseAND(
                F.bitwise_not(F.col(f"{b_prefix}{i}"))
            )
        )
        for i in range(_BLOOM_WORDS)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _pair_verify(
    cand: DataFrame,
    grams_tbl: DataFrame,
    route: str,
    left_id: str,
    right_id: str,
    left_sz: str,
    right_sz: str | None,
    metric: str,
    threshold: float,
    id_col: str = "doc_id",
) -> tuple[DataFrame, list[DataFrame]]:
    """Exact-verify the candidate pairs → (result, verify_frames):
    result emits (left_id, right_id, metric) for pairs at or above
    `threshold`; verify_frames lists any persisted helper tables for
    _finish_index_plan's cache contract (currently none — the bloom is
    deliberately lazy, see the route comment below).
    `cand` must carry the pre-computed distinct-gram set
    sizes (`left_sz`, and `right_sz` for the symmetric Jaccard
    metric) — they ride the narrow pair rows so neither route pays a
    join back to the grams table just for a size.

    Two plan shapes, one semantics:

    - ``broadcast``: join both full gram arrays onto each pair with the
      grams table as an EXPLICIT broadcast build side, then evaluate
      jaccard_col / containment_col. Optimal while the grams table
      fits the broadcast ceiling — each executor holds one copy and no
      exchange ever carries an array.
    - ``exploded``: past the ceiling the array join-back degrades to a
      shuffle that attaches a multi-KB gram array to EVERY candidate
      pair row (measured: 21× wall-clock on 10.0× candidates at n=11,
      >80 GB spill ungated at n=7 — BENCHLOG round 10; VERDICT r10
      task 1). The verify must move pair × gram information through
      SOME exchange, so the fix is two-staged — kill the false
      candidates while they are still narrow, then count only what
      survives:

      1. BLOOM PREFILTER (lossless): each doc's distinct gram set is
         summarized as a 4096-bit bloom carried as 64 flat longs
         (_gram_bloom_table). For a pair, popcount(bloom_A & ~bloom_B)
         lower-bounds |A \\ B|, and metric ≥ t upper-bounds the
         allowed misses ((1−t)·|A| for containment; |X| − α with
         α = t/(1+t)·(|A|+|B|) per side for Jaccard) — candidates
         whose PROVEN misses exceed the budget cannot reach t and are
         dropped. The bound is conservative (≤ the true miss count,
         FP-epsilon-relaxed), so no true pair is ever pruned. On the
         adversarial corpora that force this route, almost every
         candidate is false and dies here, having crossed the
         exchanges as a fixed 512 B row.
      2. EXPLODED COUNT on the survivors: explode the grams table to
         (doc, 64-bit gram hash), equi-join survivors with the left
         side's hashes, inner-join on (right id, hash) so only SHARED
         grams reach the aggregation, and count them with a map-side-
         combinable groupBy on the pair key. |∩| via xxhash64 is exact
         up to a 64-bit collision between two distinct grams of a
         candidate pair (probability ≈ pairs·|g1|·|g2|/2^64 —
         negligible at the corpus sizes that force this route; the
         broadcast route stays bit-exact).

      NO exchange in this route carries an array column (plan-pinned:
      tests/test_dedup_blocking.py) — every shuffled row is fixed-
      width longs, so sorts and spills stay cheap at any corpus size.

    Candidates share ≥ 1 prefix gram by construction, so the inner
    join never drops a real pair (|∩| ≥ 1 for every candidate)."""
    if route == "broadcast":
        paired = cand.join(
            F.broadcast(grams_tbl.select(
                F.col(id_col).alias(left_id), F.col("grams").alias("_gl")
            )),
            left_id,
        ).join(
            F.broadcast(grams_tbl.select(
                F.col(id_col).alias(right_id), F.col("grams").alias("_gr")
            )),
            right_id,
        )
        expr = (
            jaccard_col(F.col("_gl"), F.col("_gr"))
            if metric == "jaccard"
            else containment_col(F.col("_gl"), F.col("_gr"))
        )
        return (
            paired.withColumn(metric, expr)
            .filter(F.col(metric) >= threshold)
            .select(left_id, right_id, metric)
        ), []
    t = float(threshold)
    # deliberately NOT persisted, unlike the grams/prefix tables: both
    # pair-join sides read the bloom, but they project it through
    # different aliases ABOVE an identical aggregate whose input
    # exchange Catalyst dedups via ReusedExchange — measured (salted
    # fixture, n=11): an eager persist+count here cost a scheduling
    # barrier and bought nothing (1× 6.78 s persisted vs 4.99 s lazy;
    # 10× 22.5 vs 22.1 s) — the opposite of the grams table, whose two
    # consumers sit under DIFFERENT expensive subtrees.
    bloom = _gram_bloom_table(grams_tbl, id_col)
    ba = bloom.select(
        F.col("_bid").alias(left_id),
        *[F.col(f"_w{i}").alias(f"_a{i}") for i in range(_BLOOM_WORDS)],
    )
    bb = bloom.select(
        F.col("_bid").alias(right_id),
        *[F.col(f"_w{i}").alias(f"_b{i}") for i in range(_BLOOM_WORDS)],
    )
    miss_l = _bloom_miss_lower_bound("_a", "_b")  # grams of left ∉ right
    if metric == "jaccard":
        alpha = F.lit(t / (1.0 + t)) * (F.col(left_sz) + F.col(right_sz))
        keep = (
            (miss_l <= F.col(left_sz) - alpha + F.lit(_FP_EPS))
            & (
                _bloom_miss_lower_bound("_b", "_a")
                <= F.col(right_sz) - alpha + F.lit(_FP_EPS)
            )
        )
    else:
        keep = miss_l <= (
            F.lit(1.0 - t) * F.col(left_sz) + F.lit(_FP_EPS)
        )
    pair_cols = [left_id, right_id, left_sz] + (
        [right_sz] if right_sz else []
    )
    survivors = (
        cand.join(ba, left_id)
        .join(bb, right_id)
        .filter(keep)
        .select(*pair_cols)
    )
    e = grams_tbl.select(
        F.col(id_col).alias("_eid"), F.explode("grams").alias("_g")
    ).select("_eid", F.xxhash64("_g").alias("_gh"))
    inter = (
        survivors
        .join(e.withColumnRenamed("_eid", left_id), left_id)
        .join(e.withColumnRenamed("_eid", right_id), [right_id, "_gh"])
        .groupBy(*pair_cols)
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    i = F.col("_inter").cast("double")
    if metric == "jaccard":
        # identical arithmetic to jaccard_col: double casts per term,
        # then one division, 6-dp round (grams are distinct, so
        # |union| = sz1 + sz2 − |∩|)
        denom = (
            F.col(left_sz).cast("double")
            + F.col(right_sz).cast("double")
            - i
        )
    else:
        denom = F.col(left_sz).cast("double")
    expr = F.round(
        F.when(denom > 0, i / denom).otherwise(F.lit(0.0)), 6
    )
    return (
        inter.withColumn(metric, expr)
        .filter(F.col(metric) >= threshold)
        .select(left_id, right_id, metric)
    ), []


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Map every doc to the canonical (minimum) doc_id of its exact-text
    group. One shuffle on the md5 digest — never on the full text bytes."""
    digested = documents.select(
        "doc_id", F.md5(F.col(text_col)).alias("digest")
    )
    canon = digested.groupBy("digest").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        digested.join(canon, "digest")
        .select("doc_id", "canonical_id", "group_size")
    )


def streaming_exact_dedup(
    events, key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts", watermark: str = "1 hour",
):
    """Streaming twin of exact dedup: emit each key once, with state bounded
    by the watermark (`dropDuplicatesWithinWatermark` drops state for keys
    older than the watermark, so an endless stream doesn't accumulate an
    endless key set — the property that makes ingest-time dedup viable on a
    100 TB/day feed; duplicates arriving later than the watermark are the
    accepted trade)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup (blocked pairwise)
# --------------------------------------------------------------------------

def distinct_grams_table(
    documents: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *blocks, grams): one row per doc with its DISTINCT char n-gram
    set — the shared input of the prefix index, the candidate join, and the
    exact-Jaccard verify. Computing the shingle transform is the single most
    expensive per-row expression in the Jaccard pipeline (interpreted HOF ×
    text length), so callers persist THIS table once and derive everything
    else from it instead of re-shingling per consumer.

    The empty-set drop is a LENGTH filter below the projection, not
    `size(grams) > 0` above it — deliberately (VERDICT r13 #3). They
    are equivalent (char_ngrams yields [] exactly when length < n, a
    non-empty array otherwise, and NULL text fails both predicates),
    but Catalyst pushes filters through repartitions: a size(grams)
    predicate carries the WHOLE shingle transform below the scan-
    compensation exchange, so on a cold cache the entire corpus
    shingled inside the unsplit one-row-group parquet scan's single
    task (measured: pipe_dedup_clusters' grams-stats aggregate, 5,000
    docs, one 1.65 s task while 31 cores idled). The length predicate
    pushes down to the scan for free; the shingle projection stays
    ABOVE the exchange, where it parallelizes."""
    return documents.filter(F.length(F.col(text_col)) >= n).select(
        F.col(id_col), *block_cols,
        F.array_distinct(char_ngrams(F.col(text_col), n)).alias("grams"),
    )


def jaccard_prefix_table(
    documents: DataFrame,
    threshold: float,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = (),
    grams_tbl: DataFrame | None = None,
    index_frames: list | None = None,
) -> DataFrame:
    """(id, *blocks, g): the PREFIX-FILTER index over distinct character
    n-grams — the lossless candidate generator for exact Jaccard ≥ t
    (AllPairs / PPJoin prefix filtering: Bayardo et al. WWW'07, Vernica et
    al. SIGMOD'10 for the MapReduce formulation).

    Grams are globally ordered rarest-first (document frequency, then gram);
    each doc keeps only its first |g| - ⌈t·|g|⌉ + 1 grams. The prefix-
    filtering principle guarantees any pair with J ≥ t shares ≥ 1 prefix
    gram (for a feasible pair the required overlap α = ⌈t/(1+t)·(|x|+|y|)⌉
    is ≥ ⌈t·|x|⌉ on both sides, and a prefix of length |x| - ⌈t·|x|⌉ + 1 is
    at least the |x| - α + 1 the principle needs) — so the equi-join on the
    prefix gram is EXACT, unlike LSH banding. Rare-first ordering is what
    keeps candidate volume near-linear: stop-gram-like shingles shared by
    everything land in suffixes and never generate candidates.

    Pass a (persisted) `grams_tbl` from distinct_grams_table to share the
    shingle computation with other consumers. The document-frequency table
    is bounded by the gram VOCABULARY, not the corpus — small for natural
    text (shared vocabulary), so it broadcasts into the exploded rows and
    the only shuffle here is the per-doc ranking window. But a corpus of
    copy-unique vocabulary (the salted 100× fixture; any web-scale crawl
    at large n) grows the vocabulary WITH the corpus, and round 12's
    extreme panel measured the unconditional broadcast dying with a
    driver OOM at 100× — so the dictionary is persisted, counted (one
    bounded scalar over an aggregate the join needs anyway), and
    broadcast only while its estimated bytes fit the session broadcast
    ceiling; past it the df join shuffles on the gram key (same key the
    candidate join shuffles on — co-partitioned, no extra exchange
    shape). The persisted dictionary follows the shared caching
    contract: pass ``index_frames`` (a list) and it is appended for the
    caller's _finish_index_plan release; without it, the caller owns
    the storage (clearCache), same as every other lazy-path index."""
    from pyspark.sql import Window

    if grams_tbl is None:
        grams_tbl = distinct_grams_table(
            documents, n=n, text_col=text_col, id_col=id_col,
            block_cols=block_cols,
        )
    exploded = grams_tbl.select(
        id_col, *block_cols, F.size("grams").alias("sz"),
        F.explode("grams").alias("g"),
    )
    freq_raw = exploded.groupBy("g").agg(
        F.count(F.lit(1)).alias("df")
    ).persist()
    if index_frames is not None:
        index_frames.append(freq_raw)
    # bounded collect: TWO scalars from one pass over the (persisted)
    # vocabulary-sized aggregate — the row count AND the MEASURED gram
    # byte mass. n characters ≠ n bytes for non-ASCII corpora (CJK /
    # accented UTF-8 grams run 2-3×), and F.broadcast() is a forced
    # hint that bypasses Spark's own size check, so estimating from
    # characters could re-admit the driver-OOM broadcast this gate
    # exists to prevent (ADVICE r12).
    vocab, gram_bytes = freq_raw.agg(
        F.count(F.lit(1)), F.coalesce(F.sum(F.octet_length("g")), F.lit(0))
    ).first()
    try:
        thr = _parse_size_bytes(
            exploded.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold"
            )
        )
    except Exception:
        thr = 10 << 20  # Spark's stock default
    # raw payload estimate (measured gram UTF8 bytes + the long df)
    freq = (
        F.broadcast(freq_raw)
        if thr > 0 and gram_bytes + vocab * 8 <= thr
        else freq_raw
    )
    if index_frames is None:
        # public-API callers without the shared-caching contract must
        # not accumulate persisted frames until clearCache (ADVICE
        # r12): release now — the gate decision is already taken from
        # materialized data; the downstream join simply recomputes the
        # vocabulary-sized aggregate lazily, the pre-gate status quo.
        freq_raw.unpersist(blocking=False)
    w = Window.partitionBy(id_col).orderBy("df", "g")
    # FP-safe ceil: for thresholds with no exact binary representation
    # (0.7, 0.1, ...) t·|g| can land a hair ABOVE a mathematically-integer
    # product, pushing ceil up by 1 and shortening the prefix below what
    # the prefix-filtering principle requires. Nudge down by an epsilon
    # before the ceil — at worst the prefix keeps one extra gram
    # (over-admission; candidates are exact-verified anyway).
    prefix_len = (
        F.col("sz")
        - F.ceil(F.lit(float(threshold)) * F.col("sz") - F.lit(_FP_EPS))
        + 1
    )
    return (
        exploded.join(freq, "g")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= prefix_len)
        .select(id_col, *block_cols, "g", "rnk", "sz")
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    n: int | None = 3,
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    materialize: bool = False,
    verify: str = "auto",
    n_grid: tuple[int, ...] | None = None,
    shuffle_budget_bytes: int | None = None,
    preflight_sample_fraction: float | None = None,
) -> DataFrame:
    """Near-duplicate pairs by character-n-gram Jaccard — EXACT (all pairs
    with J ≥ threshold, nothing lossy), via the prefix-filter
    set-similarity self-join (see jaccard_prefix_table). One caveat on
    "exact": with ``verify='broadcast'`` (the route every corpus under
    the session broadcast ceiling takes) the intersection is bit-exact
    over the gram strings; the shuffle route (``verify='exploded'``,
    or 'auto' past the ceiling) counts |∩| over 64-bit xxhash64 gram
    hashes, so a hash collision between two distinct grams of a
    candidate pair can inflate a score one-sidedly (possible false
    positives, NEVER a missed pair; probability ≈
    pairs·|g1|·|g2|/2^64 — negligible at the corpus sizes that force
    that route; see _pair_verify).

    Shape: prefix explode → equi-join on (prefix gram, *block_cols) →
    distinct candidate pairs → join grams back → exact-Jaccard verify.
    Candidate volume is near-linear in N because only RARE grams live in
    prefixes — there is no block the size of a whole language (the original
    `lang`-keyed self-join was O(N²) within "en" at corpus scale), and the
    gram-frequency ordering is recomputed per corpus, so selectivity adapts
    to the data. `block_cols` remain semantic partitions on the join key.
    Output: (id1, id2, jaccard) for ALL pairs ≥ threshold.

    Reuse: the gram table feeds THREE consumers (the prefix index and both
    verify sides) and the prefix table feeds BOTH sides of the candidate
    self-join — each is persisted AND eagerly materialized (one count()
    job apiece) before the join is assembled. persist() alone is not
    enough: the self-join's two shuffle-map stages are scheduled
    CONCURRENTLY, and two stages racing to fill the same cold cache each
    recompute the expensive shingle/rank subtree (~2× the whole index
    build, measured). Catalyst's ReusedExchange can't help either — it
    only dedups identical exchanges, and the two sides project different
    aliases. The eager counts are deliberate lazy-API exceptions,
    documented here: this function builds an INDEX (like an ML fit step),
    and materializing it once is what makes the downstream plan cheap.
    The caches outlive the call unless ``materialize=True`` — the
    caching contract is on _finish_index_plan. Pass ``n=None`` to size
    the gram length from the corpus (ngram_jaccard_auto_n): the fixed
    n=3 default saturates on large corpora — candidate volume goes
    ~quadratic once every 3-gram is corpus-common (measured: BENCHLOG
    round 10) — and auto-n is the scale valve.

    ``verify`` picks the exact-verify plan shape (see _pair_verify):
    'auto' broadcasts the gram arrays while the grams table fits the
    session broadcast ceiling and switches to the narrow exploded
    (pair, gram-hash) verify past it — the route whose shuffle never
    carries an array and stays linear at any corpus size.
    """
    _validate_verify(verify)
    auto_est = None
    if n is None:
        auto_kw = {} if n_grid is None else {"n_grid": tuple(n_grid)}
        # the sweep's probes honor preflight_sample_fraction too — the
        # at-scale caller that can't afford exact estimate probes for
        # the pre-flight can't afford them for the sweep either
        n, auto_est = ngram_jaccard_auto_n(
            documents, threshold, text_col=text_col,
            block_cols=block_cols,
            sample_fraction=preflight_sample_fraction, **auto_kw,
        )
    if shuffle_budget_bytes is not None:
        # opt-in verify pre-flight (VERDICT r12 task 5): one linear
        # estimate pass prices the candidate join; an unpayable one
        # raises VerifyBudgetExceeded naming the payable alternatives
        # instead of launching a shuffle the cluster cannot absorb.
        # preflight_sample_fraction routes the estimate (and the
        # refusal path's higher-n repricing) through the SAMPLED cost
        # model — the refusal regime is exactly where the exact
        # probe's per-n window sort stops fitting executor memory
        # (the extreme panel switches to f=0.25 at ≥64× for this
        # reason), so a budget-guarded 100 TB caller should pass a
        # fraction rather than pay an unpayable estimate to be told
        # the join is unpayable.
        # the auto sweep already priced the selected n with the same
        # sample fraction — don't pay the estimate pass twice
        est = auto_est if auto_est is not None else (
            ngram_jaccard_candidate_estimate(
                documents, threshold, n=n, text_col=text_col,
                block_cols=block_cols,
                sample_fraction=preflight_sample_fraction,
            )
        )
        _verify_preflight(
            documents, threshold, n, est, shuffle_budget_bytes,
            "jaccard", ngram_jaccard_auto_n,
            tuple(n_grid) if n_grid is not None else _AUTO_N_GRID,
            text_col, "doc_id", block_cols, preflight_sample_fraction,
        )
    grams_tbl = distinct_grams_table(
        documents, n=n, text_col=text_col, block_cols=block_cols
    ).persist()
    # one eager job: materialize before prefix derives from it, AND
    # price the verify build side for the broadcast/exploded routing
    route = _verify_route(
        documents.sparkSession, verify,
        _materialize_grams_stats(grams_tbl, n),
    )
    prefix_frames: list = []
    prefix = jaccard_prefix_table(
        documents, threshold, n=n, text_col=text_col, block_cols=block_cols,
        grams_tbl=grams_tbl, index_frames=prefix_frames,
    ).persist()
    prefix.count()  # materialize before both self-join sides read it
    a = prefix.select(
        F.col("g"),
        *[F.col(c).alias(f"b1_{c}") for c in block_cols],
        F.col("doc_id").alias("id1"),
        F.col("rnk").alias("p1"), F.col("sz").alias("sz1"),
    )
    b = prefix.select(
        F.col("g").alias("g_r"),
        *[F.col(c).alias(f"b2_{c}") for c in block_cols],
        F.col("doc_id").alias("id2"),
        F.col("rnk").alias("p2"), F.col("sz").alias("sz2"),
    )
    t = float(threshold)
    # PPJoin pruning (both LOSSLESS, evaluated inside the join so pruned
    # rows never reach the pair-dedup shuffle):
    # - length filter: J ≥ t forces t·|x| ≤ |y| ≤ |x|/t
    # - positional filter: via the FIRST shared prefix gram, the overlap is
    #   bounded by min(|x|-p1, |y|-p2)+1; a true pair needs overlap
    #   α = t/(1+t)·(|x|+|y|), and for its first shared gram the bound
    #   holds, so rows failing it can be dropped without losing the pair
    # All three bounds compare against the RAW real-valued expression minus
    # a small epsilon instead of ceil/floor: an FP product that rounds just
    # above a mathematically-integer value would otherwise overshoot the
    # ceil by 1 and drop a true pair sitting exactly at J = t. The integer
    # left-hand sides make `x >= ceil(v)` ⟺ `x >= v`, so dropping the
    # rounding loses nothing; the epsilon only ever over-admits, and
    # candidates are exact-verified downstream.
    alpha = F.lit(t / (1.0 + t)) * (F.col("sz1") + F.col("sz2")) - F.lit(_FP_EPS)
    ubound = F.least(
        F.col("sz1") - F.col("p1"), F.col("sz2") - F.col("p2")
    ) + F.lit(1)
    cond = (
        (F.col("g") == F.col("g_r"))
        & (F.col("id1") < F.col("id2"))
        & (F.col("sz2") >= F.lit(t) * F.col("sz1") - F.lit(_FP_EPS))
        & (F.col("sz2") <= F.col("sz1") / F.lit(t) + F.lit(_FP_EPS))
        & (ubound >= alpha)
    )
    for c in block_cols:
        cond = cond & (F.col(f"b1_{c}") == F.col(f"b2_{c}"))
    cand = (
        a.join(b, cond)
        # sz1/sz2 ride the pair rows (functionally dependent on the
        # ids, so dropDuplicates keeps consistent values) — the verify
        # then never joins back just for a set size
        .select("id1", "id2", "sz1", "sz2")
        .dropDuplicates(["id1", "id2"])
    )
    result, verify_frames = _pair_verify(
        cand, grams_tbl, route, "id1", "id2", "sz1", "sz2",
        "jaccard", threshold,
    )
    return _finish_index_plan(
        result, grams_tbl, prefix, *prefix_frames, *verify_frames,
        materialize=materialize,
    )


def ngram_jaccard_candidate_estimate(
    documents: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    sample_fraction: float | None = None,
    seed: int = 7,
) -> int:
    """EXACT row count of ngram_jaccard_pairs' symmetric prefix-filter
    candidate self-join at gram size `n` BEFORE the length/positional
    prunes, pair dedup, and verify: Σ over (block, prefix gram) of
    C(prefix_count, 2). The symmetric twin of
    containment_candidate_estimate — one shingle pass + one (block, g)
    aggregate, no pair materialization. Same saturation physics: a
    bounded gram space makes prefix counts grow linearly with the
    corpus, so candidates grow ~quadratically at fixed small `n`
    (measured on the salted sf0.1 fixture: pipe_dedup_clusters'
    end-to-end 19.7x at 10x input traces exactly to this term —
    BENCHLOG.md round 10).

    With ``sample_fraction=f`` the probe runs on a seeded Bernoulli
    doc sample and the result is extrapolated by 1/f² — each unordered
    doc pair survives doc sampling with probability f², so the pair
    term's extrapolation is exactly unbiased GIVEN the prefix; the
    prefix itself re-ranks under sampled dfs, which is stable exactly
    in the heavy-tailed regime the probe targets (block proportions
    are preserved in expectation by the uniform sample). Use it to
    price a corpus too large to shingle in full: the probe cost drops
    to one pass over N·f docs."""
    full_docs = documents
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(
                f"sample_fraction must be in (0, 1], got {sample_fraction}"
            )
        documents = documents.sample(
            withReplacement=False, fraction=sample_fraction, seed=seed
        )
    grams_tbl = distinct_grams_table(
        documents, n=n, text_col=text_col, id_col=id_col,
        block_cols=block_cols,
    ).persist()  # the prefix build reads it twice (df + window rows)
    prefix_frames: list = []
    try:
        prefix = jaccard_prefix_table(
            documents, threshold, n=n, text_col=text_col, id_col=id_col,
            block_cols=block_cols, grams_tbl=grams_tbl,
            index_frames=prefix_frames,
        )
        row = (
            prefix.groupBy(*block_cols, "g")
            .agg(F.count(F.lit(1)).alias("pc"))
            # decimal(38,0) end-to-end (halved driver-side): a double
            # sum rounds past 2^53 and a LONG sum silently WRAPS past
            # 2^63 in exactly the saturated-gram regime this number
            # exists to detect — a wrapped (negative) estimate would
            # pass every downstream budget gate. pc ≤ 9.2e18 fits
            # decimal(19,0); pc² ≤ 8.5e37 fits the (38,0) product; a
            # sum past 38 digits nulls out and is raised below instead
            # of masquerading as payable.
            .agg(
                F.sum(
                    F.col("pc").cast("decimal(19,0)")
                    * (F.col("pc") - 1).cast("decimal(19,0)")
                ).alias("est2"),
                F.count(F.lit(1)).alias("n_groups"),
            )
            .collect()[0]  # bounded collect: one scalar
        )
    finally:
        grams_tbl.unpersist()
        for f in prefix_frames:
            f.unpersist()
    if row["n_groups"] == 0:
        _raise_if_probe_blind(full_docs, sample_fraction, n, text_col)
        return 0
    if row["est2"] is None:
        raise OverflowError(
            "jaccard candidate estimate exceeds 10^38 — the gram space "
            f"at n={n} is catastrophically saturated; no budget can pay "
            "this join. Raise n (ngram_jaccard_auto_n sweeps the grid), "
            "or route through minhash_lsh_pairs (band-bucketed, never "
            "all-pairs — measured sublinear to 100× input)"
        )
    est = int(row["est2"]) // 2
    return _extrapolate_sampled(est, sample_fraction)


def _raise_if_probe_blind(
    full_docs: DataFrame, sample_fraction: float | None, n: int,
    text_col: str,
) -> None:
    """ADVICE r10: a SAMPLED probe whose Bernoulli sample produced no
    grams must not return 0 — auto-n would read the extrapolated 0 as
    'payable' and green-light a possibly saturated gram size off a
    probe that saw NOTHING. Raise iff the full corpus demonstrably has
    shingleable text (∃ doc with length ≥ n ⟺ the full grams table is
    non-empty — char_ngrams yields ≥ 1 gram exactly then), so a
    genuinely empty / all-sub-n corpus still reports a true 0. The
    check is a filter + limit(1) early-exit scan — no shingle HOF, and
    it only runs on the rare empty-probe path."""
    if sample_fraction is None:
        return  # an exact probe's 0 is a true 0
    if (
        full_docs.filter(F.length(F.col(text_col)) >= n).limit(1).count()
        > 0
    ):
        raise ValueError(
            f"sampled cost-model probe (sample_fraction={sample_fraction}) "
            f"saw no grams at n={n} while the full corpus has shingleable "
            "documents — the sample is too small to price this join; "
            "raise sample_fraction instead of trusting an extrapolated 0"
        )


def _extrapolate_sampled(est: int, sample_fraction: float | None) -> int:
    """1/f² extrapolation in EXACT integer arithmetic: routing the
    long-exact sum through float division would lose low bits past
    2^53 (the precise failure mode the decimal sums eliminate).
    Fraction(f) is the exact rational value of the binary float, so
    the scaling is exact for any f."""
    if sample_fraction is None or sample_fraction >= 1.0:
        return est
    from fractions import Fraction

    fr = Fraction(sample_fraction)
    return est * fr.denominator ** 2 // fr.numerator ** 2


#: the auto-n sweep's default gram sizes (the ONE definition — both auto
#: fns default to it and the verify pre-flight's higher-n repricing uses
#: it, so the refusal message can only ever name an n that n=None
#: auto-selection would itself consider)
_AUTO_N_GRID = (3, 4, 5, 7, 9, 11)


def ngram_jaccard_auto_n(
    documents: DataFrame,
    threshold: float = 0.5,
    per_doc_budget: float = 32.0,
    n_grid: tuple[int, ...] = _AUTO_N_GRID,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    sample_fraction: float | None = None,
    seed: int = 7,
) -> tuple[int, int]:
    """Smallest gram size whose symmetric candidate estimate fits
    ``per_doc_budget × N`` → (n, estimate) — containment_auto_n's
    twin for the Jaccard self-join. Semantic note: raising `n` changes
    WHICH pairs count as near-dups (longer grams are stricter), so
    auto-n is the scale valve for corpus-level dedup (where "≥ t at a
    gram size that still individuates" is the intent), not for
    workloads pinned to a specific gram length. The containment
    variant is only PARTIALLY exempt: a verbatim substring has C=1 at
    every n (all of A's grams appear in B), so exact containments are
    n-invariant, but sub-1.0 thresholds admit near-containments that
    do shift (measured on the sf0.1 registry corpus at t=0.8: 1218
    pairs at n=7 vs 1197 at auto's n=11 — all planted verbatim
    snippets found by both; BENCHLOG round 10). ``sample_fraction`` runs every
    probe on a seeded doc sample with exact 1/f² pair-term
    extrapolation (see ngram_jaccard_candidate_estimate); the budget
    comparison always uses the FULL corpus doc count."""
    n_docs = max(int(documents.count()), 1)
    est = 0
    for n in n_grid:
        est = ngram_jaccard_candidate_estimate(
            documents, threshold, n=n, text_col=text_col, id_col=id_col,
            block_cols=block_cols, sample_fraction=sample_fraction,
            seed=seed,
        )
        if est <= per_doc_budget * n_docs:
            return n, est
    return n_grid[-1], est


def containment_col(g_in: Column, g_out: Column) -> Column:
    """Exact DIRECTED containment of gram array `g_in` in `g_out`
    (|∩| / |g_in|), 6-dp rounded — one definition shared by the
    operator and its oracle, like jaccard_col."""
    inter = F.size(F.array_intersect(g_in, g_out)).cast("double")
    denom = F.size(g_in).cast("double")
    return F.round(
        F.when(denom > 0, inter / denom).otherwise(F.lit(0.0)), 6
    )


def containment_pairs(
    documents: DataFrame,
    threshold: float = 0.8,
    n: int | None = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    materialize: bool = False,
    verify: str = "auto",
    n_grid: tuple[int, ...] | None = None,
    shuffle_budget_bytes: int | None = None,
    preflight_sample_fraction: float | None = None,
) -> DataFrame:
    """DIRECTED containment near-dup pairs — 'A lives inside B':
    C(A→B) = |S(A) ∩ S(B)| / |S(A)| over distinct char n-gram sets,
    EXACT (every ordered pair with C ≥ threshold, id_in ≠ id_out).
    Exactness caveat: ``verify='broadcast'`` is bit-exact over the
    gram strings; the shuffle route (``verify='exploded'``, or 'auto'
    past the session broadcast ceiling) counts |∩| over 64-bit
    xxhash64 gram hashes — a collision between two distinct grams of
    a candidate pair can inflate a score one-sidedly (possible false
    positives, never a missed pair; probability ≈ pairs·|g1|·|g2|/2^64
    — negligible at the corpus sizes that force that route; see
    _pair_verify).
    The asymmetric complement of ngram_jaccard_pairs: symmetric
    Jaccard misses a short document embedded verbatim in a much longer
    one (J = |A|/|B| can be arbitrarily small while C(A→B) = 1) — the
    quote/subset leak mode in corpus dedup and benchmark
    decontamination.

    Candidate generation is the ONE-SIDED prefix filter: a qualifying
    pair must share at least one of A's first |A| − ⌈t·|A|⌉ + 1
    rarest grams (pigeonhole on the required overlap ⌈t·|A|⌉ — the
    same prefix length jaccard_prefix_table already builds), so the
    contained side's prefix table equi-joins the container side's FULL
    posting list. Containment puts no upper bound on |B|, so the
    two-sided PPJoin length filter does not apply; the lossless prunes
    that do are |B| ≥ t·|A| (overlap ≤ |B|) and the A-side positional
    bound (overlap ≤ |A| − rank + 1), both FP-epsilon-relaxed so a
    pair sitting exactly at C = t is never dropped — candidates are
    exact-verified anyway.

    Scale shape: one shingle pass (shared grams table), one broadcast
    df-rank, candidates = Σ_g prefix_df(g)·df(g) — rare-first prefixes
    keep the probe side thin, the posting side is the full corpus
    index (the classic asymmetric containment join; AQE's skew split
    handles a hot gram). Output: (id_in, id_out, containment).

    Selectivity caveat: the prefix filter's near-linearity rests on a
    HEAVY-TAILED gram-frequency distribution (real text is Zipfian —
    every doc owns some rare grams). On an adversarially uniform
    small-vocabulary corpus no gram is rare and candidate volume
    degrades toward the true-pair count (which is itself large there);
    raise `n` until grams individuate (measured on the synthetic
    ~40-word-pool fixture at sf0.1: n=3 → 179 s, n=7 → 30 s).

    The grams cache outlives the call unless ``materialize=True`` —
    the caching contract is on _finish_index_plan. Pass ``n=None`` to
    size the gram length from the corpus itself (containment_auto_n;
    ``n_grid`` narrows the sweep's candidate gram sizes) — the fixed
    default n=3 is only safe while the corpus has NOT saturated the
    3-gram space (containment_candidate_estimate documents why that
    fails at scale). ``verify`` picks the exact-verify plan shape
    (_pair_verify): 'auto' broadcasts the gram arrays under the
    session broadcast ceiling, and past it ships narrow
    (pair, gram-hash) rows of the CONTAINED side — the smaller gram
    set of each pair — so the shuffle never carries an array."""
    _validate_verify(verify)
    auto_est = None
    if n is None:
        auto_kw = {} if n_grid is None else {"n_grid": tuple(n_grid)}
        # sweep probes honor preflight_sample_fraction — see
        # ngram_jaccard_pairs
        n, auto_est = containment_auto_n(
            documents, threshold, text_col=text_col, id_col=id_col,
            block_cols=block_cols,
            sample_fraction=preflight_sample_fraction, **auto_kw,
        )
    if shuffle_budget_bytes is not None:
        # opt-in verify pre-flight — see ngram_jaccard_pairs (incl.
        # why preflight_sample_fraction is the at-scale way to pay
        # for the estimate itself)
        # the auto sweep already priced the selected n with the same
        # sample fraction — don't pay the estimate pass twice
        est = auto_est if auto_est is not None else (
            containment_candidate_estimate(
                documents, threshold, n=n, text_col=text_col, id_col=id_col,
                block_cols=block_cols,
                sample_fraction=preflight_sample_fraction,
            )
        )
        _verify_preflight(
            documents, threshold, n, est, shuffle_budget_bytes,
            "containment", containment_auto_n,
            tuple(n_grid) if n_grid is not None else _AUTO_N_GRID,
            text_col, id_col, block_cols, preflight_sample_fraction,
        )
    grams_tbl = distinct_grams_table(
        documents, n=n, text_col=text_col, id_col=id_col,
        block_cols=block_cols,
    ).persist()
    # one eager job: materialize before prefix + postings derive, AND
    # price the verify build side for the broadcast/exploded routing
    route = _verify_route(
        documents.sparkSession, verify,
        _materialize_grams_stats(grams_tbl, n),
    )
    prefix_frames: list = []
    prefix = jaccard_prefix_table(
        documents, threshold, n=n, text_col=text_col, id_col=id_col,
        block_cols=block_cols, grams_tbl=grams_tbl,
        index_frames=prefix_frames,
    )
    a = prefix.select(
        F.col("g"),
        *[F.col(c).alias(f"b1_{c}") for c in block_cols],
        F.col(id_col).alias("id_in"),
        F.col("rnk").alias("p1"),
        F.col("sz").alias("sz_in"),
    )
    postings = grams_tbl.select(
        F.col(id_col).alias("id_out"),
        *[F.col(c).alias(f"b2_{c}") for c in block_cols],
        F.size("grams").alias("sz_out"),
        F.explode("grams").alias("g_r"),
    )
    t = float(threshold)
    cond = (
        (F.col("g") == F.col("g_r"))
        & (F.col("id_in") != F.col("id_out"))
        & (F.col("sz_out") >= F.lit(t) * F.col("sz_in") - F.lit(_FP_EPS))
        & (
            F.col("sz_in") - F.col("p1") + 1
            >= F.lit(t) * F.col("sz_in") - F.lit(_FP_EPS)
        )
    )
    for c in block_cols:
        cond = cond & (F.col(f"b1_{c}") == F.col(f"b2_{c}"))
    cand = (
        a.join(postings, cond)
        # sz_in rides the pair rows (functionally dependent on id_in)
        # — the verify never joins back just for the denominator
        .select("id_in", "id_out", "sz_in")
        .dropDuplicates(["id_in", "id_out"])
    )
    result, verify_frames = _pair_verify(
        cand, grams_tbl, route, "id_in", "id_out", "sz_in", None,
        "containment", threshold, id_col=id_col,
    )
    return _finish_index_plan(
        result, grams_tbl, *prefix_frames, *verify_frames,
        materialize=materialize,
    )


def containment_candidate_estimate(
    documents: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    grams_tbl: DataFrame | None = None,
    sample_fraction: float | None = None,
    seed: int = 7,
) -> int:
    """EXACT row count of containment_pairs' one-sided prefix-filter
    candidate join at gram size `n`, BEFORE the sz/positional prunes,
    the pair dedup, and the verify: Σ over prefix entries (doc, g) of
    (df_block(g) − 1). One shingle pass + one df aggregate + one
    equi-join onto the df table — NO pair materialization, so it stays
    linear in input even when the answer says the pair join would be
    quadratic. That is the point: measure the blow-up without paying
    it.

    This is the cost model behind containment_auto_n. With a BOUNDED
    gram space (small `n` over a bounded alphabet) every gram's df
    grows linearly with corpus size, so this estimate grows
    ~quadratically — no rarest-first ordering can save a gram size
    whose vocabulary the corpus has saturated. Raising `n` grows the
    gram space combinatorially until documents own corpus-rare grams
    again and the estimate flattens toward O(N). Two-point measurement
    on the salted sf0.1 fixture: BENCHLOG.md round 10.

    With ``sample_fraction=f`` (incompatible with a caller-supplied
    `grams_tbl`) the probe runs on a seeded Bernoulli doc sample and
    extrapolates by 1/f² — each (prefix entry, other doc) pair
    survives doc sampling with probability f², so the sum's
    extrapolation is exactly unbiased GIVEN the prefix; the prefix
    re-ranks under sampled dfs, which is stable exactly in the
    heavy-tailed regime the probe targets. The linear probe then costs
    one pass over N·f docs — price a 100 TB corpus from a 1% sample."""
    if sample_fraction is not None:
        if grams_tbl is not None:
            raise ValueError(
                "sample_fraction requires the estimator to build its own "
                "grams table — pass one or the other, not both"
            )
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(
                f"sample_fraction must be in (0, 1], got {sample_fraction}"
            )
        full_docs = documents
        documents = documents.sample(
            withReplacement=False, fraction=sample_fraction, seed=seed
        )
    own_grams = grams_tbl is None
    if own_grams:
        # the plan consumes the grams table in THREE branches (prefix
        # window, global-df broadcast, block-df aggregate) — persist
        # for the duration of the scalar collect or the shingle HOF
        # (the pipeline's most expensive per-row expression) runs 3x
        grams_tbl = distinct_grams_table(
            documents, n=n, text_col=text_col, id_col=id_col,
            block_cols=block_cols,
        ).persist()
    prefix_frames: list = []
    try:
        prefix = jaccard_prefix_table(
            documents, threshold, n=n, text_col=text_col, id_col=id_col,
            block_cols=block_cols, grams_tbl=grams_tbl,
            index_frames=prefix_frames,
        )
        df_tbl = (
            grams_tbl.select(*block_cols, F.explode("grams").alias("g"))
            .groupBy(*block_cols, "g")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        row = (
            prefix.join(df_tbl, on=[*block_cols, "g"])
            # decimal(38,0): a long sum would silently wrap past 2^63
            # in the saturated regime the estimate exists to flag (see
            # the sibling note in ngram_jaccard_candidate_estimate);
            # each term ≤ 9.2e18 fits (19,0), the sum widens to (38,0)
            .agg(
                F.sum(
                    (F.col("df") - 1).cast("decimal(19,0)")
                ).alias("est"),
                F.count(F.lit(1)).alias("n_entries"),
            )
            .collect()[0]  # bounded collect: one scalar
        )
    finally:
        if own_grams:
            grams_tbl.unpersist()
        for f in prefix_frames:
            f.unpersist()
    if row["n_entries"] == 0:
        if sample_fraction is not None:
            _raise_if_probe_blind(full_docs, sample_fraction, n, text_col)
        return 0
    if row["est"] is None:
        raise OverflowError(
            "containment candidate estimate exceeds 10^38 — the gram "
            f"space at n={n} is catastrophically saturated; no budget "
            "can pay this join. Raise n (containment_auto_n sweeps the "
            "grid), or route through minhash_lsh_pairs (band-bucketed, "
            "never all-pairs — measured sublinear to 100× input)"
        )
    return _extrapolate_sampled(int(row["est"]), sample_fraction)


def containment_auto_n(
    documents: DataFrame,
    threshold: float = 0.8,
    per_doc_budget: float = 32.0,
    n_grid: tuple[int, ...] = _AUTO_N_GRID,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    sample_fraction: float | None = None,
    seed: int = 7,
) -> tuple[int, int]:
    """Smallest gram size whose candidate-join estimate fits
    ``per_doc_budget × N`` → (n, estimate). The scale-safety valve for
    containment_pairs: gram-size selectivity is a property of the
    CORPUS (vocabulary breadth, doc length, skew), not of the operator,
    and a fixed small `n` silently goes quadratic once the corpus
    saturates the gram space (see containment_candidate_estimate).
    Each probe is one linear pass over the corpus; on very large
    corpora pass ``sample_fraction`` — every probe runs on a seeded
    doc sample with exact 1/f² pair-term extrapolation (uniform doc
    sampling preserves block proportions in expectation), the budget
    comparison uses the FULL corpus doc count, and pairs are then
    built at the chosen `n` on the full corpus."""
    n_docs = max(int(documents.count()), 1)
    est = 0
    for n in n_grid:
        est = containment_candidate_estimate(
            documents, threshold, n=n, text_col=text_col, id_col=id_col,
            block_cols=block_cols, sample_fraction=sample_fraction,
            seed=seed,
        )
        if est <= per_doc_budget * n_docs:
            return n, est
    return n_grid[-1], est


#: conservative per-candidate cost of the exploded/bloom verify's pair
#: shuffle (two ids + gram-hash rows for the contained side, amortized) —
#: the constant the round-12 extreme panel priced its 23 GiB (payable) /
#: 124 GiB (refused) projections with; moved into the library so the
#: pre-flight and the panel price with the same number.
VERIFY_BYTES_PER_CAND = 512


class VerifyBudgetExceeded(RuntimeError):
    """Raised by the opt-in verify pre-flight when the projected
    candidate-pair shuffle exceeds the caller's byte budget. The message
    prices the refused join AND the payable alternatives the library
    ships (VERDICT r12 task 5) — a refusal at 100 TB must hand the
    operator a next move, not just a number."""


def _verify_preflight(
    documents: DataFrame,
    threshold: float,
    n: int,
    estimate: int,
    budget_bytes: int,
    kind: str,
    auto_n_fn,
    n_grid: tuple[int, ...],
    text_col: str,
    id_col: str,
    block_cols: tuple[str, ...],
    sample_fraction: float | None,
) -> None:
    """Refuse an unpayable exact-verify join with priced alternatives:
    (1) the smallest HIGHER gram size in the grid whose re-priced
    estimate fits the budget (longer grams individuate more — the
    auto-n valve), (2) the MinHash-LSH route, measured sublinear on the
    extreme panel (8.0× wall at 32×, 18.2× at 100× input — BENCHLOG
    round 12) and never all-pairs. Pricing the higher-n alternatives
    costs one linear estimate pass per grid step — paid only on the
    refusal path, where the caller was about to pay an unpayable join."""
    projected = estimate * VERIFY_BYTES_PER_CAND
    if projected <= budget_bytes:
        return
    n_docs = max(int(documents.count()), 1)
    per_doc = budget_bytes / (VERIFY_BYTES_PER_CAND * n_docs)
    higher = tuple(g for g in n_grid if g > n)
    alt = None
    if higher:
        n2, est2 = auto_n_fn(
            documents, threshold, per_doc_budget=per_doc, n_grid=higher,
            text_col=text_col, id_col=id_col, block_cols=block_cols,
            sample_fraction=sample_fraction,
        )
        if est2 * VERIFY_BYTES_PER_CAND <= budget_bytes:
            alt = (
                f"raise the gram size to n={n2} (re-priced estimate "
                f"{est2:,} candidates ≈ "
                f"{est2 * VERIFY_BYTES_PER_CAND / 2**30:.1f} GiB — fits "
                "this budget; pass n=None to let "
                f"{'containment' if kind == 'containment' else 'ngram_jaccard'}"
                "_auto_n pick it)"
            )
    if alt is None:
        alt = (
            "no gram size in the grid pays this budget — route through "
            "minhash_lsh_pairs instead"
        )
    raise VerifyBudgetExceeded(
        f"{kind} verify refused at n={n}: {estimate:,} projected "
        f"candidates ≈ {projected / 2**30:.1f} GiB pair shuffle > budget "
        f"{budget_bytes / 2**30:.1f} GiB. Payable alternatives: {alt}; "
        "minhash_lsh_pairs runs band-bucketed (never all-pairs, measured "
        "sublinear to 100× input — 18.2× wall at 100×) and finds the "
        "same near-dup mass at a tunable recall."
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _explode_bands(
    sig_tbl: DataFrame, id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = ("grams",),
) -> DataFrame:
    """(id, *carry, band, bsig) from (id, *carry, sig): B rows per doc, each
    carrying one band's sub-signature slice."""
    rows_per_band = len(MINHASH_PERMS) // MINHASH_BANDS
    return sig_tbl.select(
        id_col,
        *carry_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.slice(
                            "sig", bi * rows_per_band + 1, rows_per_band
                        ).alias("bsig"),
                    )
                    for bi in range(MINHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select(id_col, *carry_cols, F.col("b.band").alias("band"),
             F.col("b.bsig").cast("array<long>").alias("bsig"))


def band_table(
    documents: DataFrame, w: int = 3, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, grams, band, bsig): the LSH band index of a corpus over w-token
    shingles — B rows per doc, each carrying one band's sub-signature. The
    join key for every MinHash candidate-generation variant (self-join for
    pair mining, cross-corpus join for decontamination); persist/materialize
    it once per corpus and reuse.

    The K permutation minima are AGGREGATES (`min((h·a+b) mod P)` per doc)
    computed in the same hash aggregation that collects the gram set — one
    whole-stage-codegen shuffle, no per-element interpreted HOFs and no
    second pass over materialized hash arrays. Docs with no shingles
    (shorter than w tokens) carry no bands: they can never verify ≥ any
    positive Jaccard threshold, so dropping them changes no result while
    keeping empty-signature docs from band-colliding with each other."""
    shingled = documents.select(
        F.col(id_col), F.explode(tokens_shingles(F.col(text_col), w)).alias("g")
    )
    hashed = shingled.select(id_col, "g", shingle_hash(F.col("g")).alias("h"))
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(FNV_MOD)).alias(f"mh{j}")
        for j, (a, b) in enumerate(MINHASH_PERMS)
    ]
    agg = hashed.groupBy(id_col).agg(
        F.collect_set("g").alias("grams"), *mins
    )
    sig_tbl = agg.select(
        id_col, "grams",
        F.array(*[F.col(f"mh{j}") for j in range(len(MINHASH_PERMS))]).alias(
            "sig"
        ),
    )
    return _explode_bands(sig_tbl, id_col)


def near_dup_matches(
    new_docs: DataFrame,
    corpus_bands: DataFrame,
    threshold: float = 0.5,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Contamination REPORT — the auditable counterpart of near_dup_filter:
    every (incoming doc, reference-corpus doc, jaccard) match above the
    threshold, so a decontamination run can show its work (which benchmark
    items leaked, from where, how strongly) instead of silently dropping.
    Same banded candidate generation; a pair matching via several bands is
    emitted once (distinct over the identical verified jaccard)."""
    nb = band_table(new_docs, w, text_col, id_col)
    cb = corpus_bands.select(
        F.col("band").alias("c_band"),
        F.col("bsig").alias("c_bsig"),
        F.col(id_col).alias("corpus_doc_id"),
        F.col("grams").alias("c_grams"),
    )
    return (
        nb.join(
            cb,
            (F.col("band") == F.col("c_band")) & (F.col("bsig") == F.col("c_bsig")),
        )
        .select(
            id_col, "corpus_doc_id",
            jaccard_col(F.col("grams"), F.col("c_grams")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .distinct()
    )


def near_dup_filter(
    new_docs: DataFrame,
    corpus_bands: DataFrame,
    threshold: float = 0.5,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus near-dup filter: drop incoming docs that near-duplicate
    a STATIC reference corpus (benchmark decontamination, incremental
    ingest against an existing training set).

    `corpus_bands` is a band_table() of the reference corpus — built once,
    stored, reused across runs. Incoming docs band the same way, equi-join
    on (band, bsig) — cross-corpus, so no id ordering constraint — then
    exact-Jaccard verification, and survivors come out of a left-anti join.
    Streaming wiring: run this inside foreachBatch per micro-batch (the
    anti-join needs batch semantics); the banding itself is stateless."""
    nb = band_table(new_docs, w, text_col, id_col)
    cb = corpus_bands.select(
        F.col("band").alias("c_band"),
        F.col("bsig").alias("c_bsig"),
        F.col("grams").alias("c_grams"),
    )
    matched = (
        nb.join(
            cb,
            (F.col("band") == F.col("c_band")) & (F.col("bsig") == F.col("c_bsig")),
        )
        .filter(jaccard_col(F.col("grams"), F.col("c_grams")) >= threshold)
        .select(id_col)
        .distinct()
    )
    return new_docs.join(matched, id_col, "left_anti")


def minhash_lsh_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = False,
) -> DataFrame:
    """Candidate pairs via LSH banding + exact-Jaccard verification, over
    w-token shingles.

    Stages: signature (no shuffle) → explode bands (×B) → self-join on
    (band, band-signature) → distinct candidate pairs → verify with exact
    shingle Jaccard. At 100 TB the band join dominates; salting the hottest
    buckets or raising rows-per-band bounds it. Candidate volume stays
    near-linear because random doc pairs share ~no token shingles. The band
    index feeds both sides of the self-join → persisted AND eagerly
    materialized (the join's two map stages race a cold cache and would
    each recompute the signature aggregation otherwise — see
    ngram_jaccard_pairs)."""
    banded = band_table(documents, w, text_col, id_col).persist()
    banded.count()

    left = banded.select(
        F.col("band"), F.col("bsig"),
        F.col(id_col).alias("id1"), F.col("grams").alias("g1"),
    )
    right = banded.select(
        F.col("band").alias("band_r"), F.col("bsig").alias("bsig_r"),
        F.col(id_col).alias("id2"), F.col("grams").alias("g2"),
    )
    cand = (
        left.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("bsig") == F.col("bsig_r"))
            & (F.col("id1") < F.col("id2")),
        )
        .select("id1", "id2", "g1", "g2")
        .dropDuplicates(["id1", "id2"])
    )
    return _finish_index_plan(
        cand.withColumn("jaccard", jaccard_col(F.col("g1"), F.col("g2")))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard"),
        banded, materialize=materialize,
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_table(
    documents: DataFrame,
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """(doc_id, *blocks, sig): the SimHash signature table.

    Frequency-weighted simhash: every token OCCURRENCE votes (distinct
    token sets are near-identical across same-vocabulary docs — counts are
    what distinguishes them).

    The 48 per-bit majority votes are CONDITIONAL AGGREGATES, not array
    HOFs: each bit is `sum(bit test)` over the token rows, so the whole
    signature is one hash aggregation in whole-stage codegen with map-side
    partial aggregation — the shuffle carries 49 longs per (doc, block)
    group instead of a collect_list of every token hash, and nothing is
    interpreted per element. (an array-form variant would keep it for callers
    that already hold materialized hash arrays.)"""
    toks = documents.select(
        "doc_id", *[F.col(c) for c in block_cols],
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    )
    # scramble ONCE per token occurrence, before the aggregation —
    # each bit vote then tests one bare bit of h1/h2
    hashed = toks.withColumn("h", shingle_hash(F.col("t"))).select(
        "doc_id", *block_cols,
        ((F.col("h") * F.lit(SIMHASH_SCRAMBLE_1)) % F.lit(FNV_MOD)).alias("h1"),
        ((F.col("h") * F.lit(SIMHASH_SCRAMBLE_2)) % F.lit(FNV_MOD)).alias("h2"),
    )
    half = SIMHASH_BITS // 2
    votes = [
        F.sum(
            (
                F.col("h1" if j < half else "h2")
                .bitwiseAND(F.lit(1 << (j % half)))
                > 0
            ).cast("long")
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = hashed.groupBy("doc_id", *[F.col(c) for c in block_cols]).agg(
        F.count(F.lit(1)).alias("n_tok"), *votes
    )
    bits = [
        F.when(F.col(f"v{j}") * 2 > F.col("n_tok"), F.lit(1 << j).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for j in range(SIMHASH_BITS)
    ]
    sig = bits[0]
    for bcol in bits[1:]:
        sig = sig + bcol
    return agg.select(
        "doc_id", *[F.col(c) for c in block_cols], sig.alias("sig")
    )


def _simhash_segment_starts(max_hamming: int, bits: int = SIMHASH_BITS):
    """Split [0, bits) into max_hamming+1 contiguous segments (width as even
    as possible). Pigeonhole: a pair at Hamming distance ≤ d differs in at
    most d segments, so at least one of the d+1 segments matches EXACTLY —
    joining on (segment index, segment value) is a lossless candidate
    generator for the ≤ d band (Manku et al., WWW'07 chunking scheme)."""
    n = max_hamming + 1
    base, extra = divmod(bits, n)
    starts, pos = [], 0
    for i in range(n):
        width = base + (1 if i < extra else 0)
        starts.append((pos, width))
        pos += width
    return starts


def simhash_candidates(
    sigs: DataFrame,
    max_hamming: int = 6,
    block_cols: tuple[str, ...] = ("lang",),
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Distinct candidate pairs (id1, id2, s1, s2) that share ≥ 1 signature
    segment (and every block column). Blocking is the SEGMENT value — a
    48-bit signature spreads same-language docs across 2^width buckets, so
    no block is the size of a whole language (the previous `lang`-keyed
    self-join was O(N²) within "en" at corpus scale); candidate volume is
    near-linear in N because unrelated docs share no 24-bit (d=1) segment.
    `block_cols` remain as semantic partitions on the join key — pairs
    never cross them — and AQE's skew-join splitting handles any residual
    hot segment value."""
    segs = _simhash_segment_starts(max_hamming, bits=bits)
    seg_struct = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("seg"),
                    F.shiftright(F.col("sig"), start)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("segval"),
                )
                for i, (start, width) in enumerate(segs)
            ]
        )
    ).alias("s")
    banded = sigs.select(
        "doc_id", *block_cols, "sig", seg_struct
    ).select(
        "doc_id", *block_cols, "sig",
        F.col("s.seg").alias("seg"), F.col("s.segval").alias("segval"),
    )
    a = banded.select(
        F.col("seg"), F.col("segval"),
        *[F.col(c).alias(f"b1_{c}") for c in block_cols],
        F.col("doc_id").alias("id1"), F.col("sig").alias("s1"),
    )
    b = banded.select(
        F.col("seg").alias("seg_r"), F.col("segval").alias("segval_r"),
        *[F.col(c).alias(f"b2_{c}") for c in block_cols],
        F.col("doc_id").alias("id2"), F.col("sig").alias("s2"),
    )
    cond = (
        (F.col("seg") == F.col("seg_r"))
        & (F.col("segval") == F.col("segval_r"))
        & (F.col("id1") < F.col("id2"))
    )
    for c in block_cols:
        cond = cond & (F.col(f"b1_{c}") == F.col(f"b2_{c}"))
    return (
        a.join(b, cond)
        .select("id1", "id2", "s1", "s2")
        .dropDuplicates(["id1", "id2"])
    )


def simhash_pairs(
    documents: DataFrame,
    max_hamming: int = 6,
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    materialize: bool = False,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Candidate generation is segment-blocked (see simhash_candidates) and
    LOSSLESS for the ≤ max_hamming band, so the result is exactly the pairs
    a full pairwise comparison within `block_cols` would produce — same
    semantics, near-linear candidate volume instead of O(N²) per block.
    The signature table feeds both sides of the segment self-join, so it is
    persisted and eagerly materialized — one signature aggregation per
    corpus, not two (the join's concurrent map stages would otherwise race
    the cold cache and each recompute it — see ngram_jaccard_pairs)."""
    sigs = simhash_table(documents, text_col, block_cols).persist()
    sigs.count()
    cand = simhash_candidates(sigs, max_hamming, block_cols)
    hamming = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return _finish_index_plan(
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming"),
        sigs, materialize=materialize,
    )


# --------------------------------------------------------------------------
# Duplicate clusters: pairs → connected components → canonical survivors
# --------------------------------------------------------------------------

#: edge-count gate for the driver-local union-find fast path in
#: connected_components: a pair graph this small (~30 MB collected) is a
#: CONTRACTION of the corpus — solving it locally replaces ~2 Spark jobs per
#: propagation round with one collect, the same smallness-triggered local
#: strategy Spark applies when it broadcasts a small join side. Graphs above
#: the gate take the distributed label-propagation loop.
LOCAL_CC_MAX_EDGES = 2_000_000


def _local_union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find with path compression + union by min root — the exact
    min-label semantics of the distributed loop, O(E·α(E)) driver-side."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the component label is the min node id,
            # matching the distributed min-label fixpoint
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {node: find(node) for node in parent}


def _star_contraction_labels(
    e: DataFrame, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SOCC 2014) — the
    O(log² n)-round alternative to min-label propagation for
    adversarially DEEP graphs (propagation needs rounds ~ the longest
    min-id path; a 10⁶-node chain is 10⁶ driver-synced rounds there,
    ~40 here).

    Per round, the edge set is REWRITTEN twice:
    - large-star(u): every neighbor v > u connects to
      m = min(Γ(u) ∪ {u});
    - small-star over (larger→smaller)-directed edges: every smaller
      neighbor AND u itself connect to m = min of u's smaller
      neighborhood.
    Both emit strictly-decreasing attachments, so the fixpoint is a
    forest of stars centered at each component's MINIMUM id — the same
    labels min-label propagation produces. Convergence is detected with
    one (count, xxhash-sum) agg over the canonical edge set; self-loops
    and duplicate edges are dropped each rewrite, which is what keeps
    round cost shrinking as components contract.

    Input `e` is the raw (a, b) pair frame; returns (node, component)
    for every node appearing in ≥1 pair (self-paired isolates label
    themselves)."""
    nodes0 = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        e.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    sig_prev = None
    for _ in range(max_iter):
        # ---- large-star ----
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )
        edges = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # ---- small-star (edges are (larger u → smaller v)) ----
        mins2 = edges.groupBy("u").agg(F.min("v").alias("m"))
        attach = edges.join(mins2, "u").select(
            F.col("v").alias("n"), F.col("m")
        )
        selfa = mins2.select(F.col("u").alias("n"), F.col("m"))
        edges = (
            attach.union(selfa)
            .select(
                F.greatest("n", "m").alias("u"), F.least("n", "m").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        sig = tuple(
            edges.agg(
                F.count(F.lit(1)),
                # decimal(38,0) accumulator: a long sum of xxhash64 values
                # overflows (ANSI abort) on graphs of any real size
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            ).collect()[0]
        )
        if sig == sig_prev:
            break
        sig_prev = sig
    else:
        raise RuntimeError(
            f"star-contraction did not converge in {max_iter} rounds "
            "(theoretical bound is O(log^2 n) — raise max_iter)"
        )
    # fixpoint = stars (u → component-min v); centers appear only as v
    labels = edges.groupBy("u").agg(F.min("v").alias("component"))
    return nodes0.join(
        labels.select(F.col("u").alias("node"), "component"), "node", "left"
    ).select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
    local_max_edges: int = LOCAL_CC_MAX_EDGES,
    deep_graph: bool = False,
) -> DataFrame:
    """Connected components of the undirected near-duplicate pair graph —
    the step that turns pairwise matches into dedup decisions (a doc can
    match several others transitively; you drop per CLUSTER, not per pair).

    Strategy is size-gated like a broadcast join: the edge list is counted
    (one scalar job on the persisted edges), and a graph at or under
    `local_max_edges` is solved with driver-side union-find — the pair
    graph is a contraction of the corpus, so even a 100 TB dedup run often
    lands here, and the local solve replaces ~2 Spark jobs per propagation
    round with one collect. Larger graphs run the distributed loop below.
    Pass ``local_max_edges=0`` to force the distributed path.

    Min-label propagation: every node starts labeled with itself; each
    round it takes the min of its own and its neighbors' labels; fixpoint =
    every node holds its component's min id. One equi-join shuffle per
    round, converging in O(cluster diameter) rounds — near-dup clusters are
    shallow (dups of a common source), so typically 2-4. Lineage is
    truncated every round with localCheckpoint (an iterative join's plan
    otherwise grows exponentially); on a real cluster prefer
    ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for
    executor-loss resilience. For adversarially DEEP graphs pass
    ``deep_graph=True``: the distributed path switches to alternating
    large-star/small-star contraction (Kiveris et al., "CC in MapReduce
    and Beyond"), O(log² n) rounds instead of O(diameter) —
    property-tested label-identical to this path in test_components.

    Convergence is detected with sum(label): labels only ever decrease, so
    the sum strictly decreases until fixpoint — one cheap agg per round
    instead of a join-and-compare.

    Returns (node, component): component = min doc_id reachable. Nodes not
    in any pair don't appear (they're their own singleton clusters).
    """
    # persist the directed edges BEFORE the symmetrizing union: both union
    # branches read `e`, and without the cache the (potentially expensive)
    # pair-generation subtree would execute twice in the first job
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    spark = pairs.sparkSession
    n_edges = e.count()  # materializes the persist; also sizes the strategy
    if n_edges <= local_max_edges:
        import pyspark.sql.types as T

        comp = _local_union_find(
            [(r["a"], r["b"]) for r in e.collect()]
        )
        e.unpersist()
        node_type = e.schema["a"].dataType
        out_schema = T.StructType(
            [
                T.StructField("node", node_type, False),
                T.StructField("component", node_type, False),
            ]
        )
        return spark.createDataFrame(sorted(comp.items()), out_schema)
    if deep_graph:
        try:
            # unpersist in finally: the non-convergence raise must not
            # leave `e` pinned in executor storage for the session
            return _star_contraction_labels(e, max_iter)
        finally:
            e.unpersist()
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    # The pair graph is a CONTRACTION of the corpus (only docs in ≥1 pair),
    # typically orders of magnitude smaller than the input — but AQE's
    # parallelism-first coalescing keeps every per-round shuffle at core-count
    # partitions, so a 100k-edge graph pays dozens of near-empty scheduler
    # slots per round. For the duration of the (already-eager) loop, size the
    # tiny iterative shuffles by BYTES instead (coalesce as small as the data
    # says); the caller's setting is restored before returning.
    pf_key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    try:
        pf_prev = spark.conf.get(pf_key)
    except Exception:
        pf_prev = None
    try:
        spark.conf.set(pf_key, "false")
        labels = (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .localCheckpoint()
        )
        prev_sum = labels.agg(F.sum("component")).collect()[0][0]
        for _ in range(max_iter):
            nbr_min = (
                sym.join(
                    labels.select(
                        F.col("node").alias("b"),
                        F.col("component").alias("nbr_comp"),
                    ),
                    "b",
                )
                .groupBy("a")
                .agg(F.min("nbr_comp").alias("nbr_min"))
            )
            labels = (
                labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_min"), F.col("component")),
                    ).alias("component"),
                )
                .localCheckpoint()
            )
            new_sum = labels.agg(F.sum("component")).collect()[0][0]
            if new_sum == prev_sum:
                converged = True
                break
            prev_sum = new_sum
        else:
            converged = False
        if not converged:
            # silent non-convergence would split one real cluster into
            # several "canonical" copies downstream — fail loudly (label
            # propagation needs rounds ~ the longest min-id path; raise
            # max_iter, or pre-contract with the local union-find gate)
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "propagation rounds; raise max_iter"
            )
    finally:
        if pf_prev is not None:
            spark.conf.set(pf_key, pf_prev)
        else:
            spark.conf.unset(pf_key)
        # also on the non-convergence raise: don't leak the persisted
        # edge frames into session storage
        sym.unpersist()
        e.unpersist()
    return labels


def duplicate_clusters(
    pairs: DataFrame, src: str = "id1", dst: str = "id2"
) -> DataFrame:
    """(doc_id, cluster_id) for every doc that appears in a near-dup pair;
    cluster_id = the smallest doc_id in the connected component."""
    return connected_components(pairs, src, dst).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def dedup_keep_canonical(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """The actual dedup: keep one doc per near-dup cluster (the min id —
    deterministic) plus every doc in no pair. A left-anti join against the
    non-canonical members; at scale the drop list is small relative to the
    corpus, so AQE turns this into a broadcast anti join."""
    comp = connected_components(pairs, src, dst)
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return documents.join(drop, id_col, "left_anti")


def dedup_keep_best(
    documents: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    src: str = "id1",
    dst: str = "id2",
    deep_graph: bool = False,
) -> DataFrame:
    """Quality-priority canonical keep: per near-dup cluster, keep the
    member MAXIMIZING `score_col` (min id breaks ties — deterministic),
    plus every doc in no pair. Production dedup keeps the best copy, not
    the lowest id: the near-dups of a document differ in boilerplate,
    truncation, and OCR noise, and dropping the high-quality copy because
    a mangled twin has a smaller id throws away exactly the data the
    pipeline exists to keep (dedup_keep_canonical remains the
    score-free special case).

    Plan shape: components run on the pair graph (a contraction of the
    corpus); only PAIRED docs join their (id, score) projection back —
    dimension-sized relative to the corpus — one window per cluster ranks
    them, and the losers anti-join out of the full corpus (AQE turns the
    small drop list into a broadcast anti join, same as the canonical
    keep)."""
    from pyspark.sql import Window

    comp = connected_components(pairs, src, dst, deep_graph=deep_graph)
    scored = comp.join(
        documents.select(F.col(id_col).alias("node"), F.col(score_col)),
        "node",
    )
    w = Window.partitionBy("component").orderBy(
        F.desc(score_col), F.asc("node")
    )
    drop = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") > 1)
        .select(F.col("node").alias(id_col))
    )
    return documents.join(drop, id_col, "left_anti")


# --------------------------------------------------------------------------
# exact n-gram decontamination (GPT-3 appendix C / PaLM style)
# --------------------------------------------------------------------------

def exact_ngram_matches(
    documents: DataFrame,
    benchmark: DataFrame,
    w: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bench_doc_id, n_shared_grams): training docs that share at
    least one EXACT w-token n-gram with a benchmark/eval document — the
    GPT-3-style decontamination test (13-gram overlap), the exact-match
    complement of the MinHash near-dup filter (near_dup_filter): a doc can
    embed one verbatim benchmark sentence while being globally dissimilar.

    Scale shape: the benchmark side is SMALL by definition (eval sets are
    thousands of docs, the corpus is the 100 TB side) — its exploded
    distinct (gram, bench_doc_id) index is BROADCAST, so the corpus side
    streams through a broadcast hash join with NO shuffle of corpus grams;
    the only exchange is the final per-(doc, bench) count aggregation on
    matched rows (rare). Joining on the gram STRING keeps it exact — and
    costs nothing extra here because the broadcast build side holds the
    strings driver-free either way."""
    def explode_grams(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(
                F.array_distinct(tokens_shingles(F.col(text_col), w))
            ).alias("g"),
        )

    corpus_grams = explode_grams(documents, "doc_id_t")
    bench_grams = F.broadcast(explode_grams(benchmark, "bench_doc_id"))
    return (
        corpus_grams.join(bench_grams, "g")
        .groupBy("doc_id_t", "bench_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .select(
            F.col("doc_id_t").alias(id_col), "bench_doc_id", "n_shared_grams"
        )
    )


def exact_ngram_decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    w: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus docs that survive exact w-gram decontamination: drop any doc
    sharing ≥1 exact w-token n-gram with the benchmark set. Anti join on
    the matched id set (small), so AQE broadcasts the drop list."""
    hit = (
        exact_ngram_matches(documents, benchmark, w, text_col, id_col)
        .select(id_col)
        .distinct()
    )
    return documents.join(hit, id_col, "left_anti")


# --------------------------------------------------------------------------
# Bloom-filter decontamination (the sketch-sized variant of the exact path)
# --------------------------------------------------------------------------

#: Bloom geometry: m bits, k salted hashes per gram. 2^20 bits packs into
#: a <= 32k-entry sparse word map (~512 KB worst case) — broadcastable no
#: matter how large the corpus side grows, which is the point: the exact
#: path broadcasts the benchmark's GRAM STRINGS, whose size grows with the
#: eval set; the Bloom bitset is capped by construction.
BLOOM_BITS = 1 << 20
BLOOM_K = 3

_brng = random.Random(4242)
#: salted affine probes over the portable shingle hash — fixed seed so the
#: Spark plan and the DuckDB oracle set/test IDENTICAL bits (the oracle
#: reproduces the sketch bit-for-bit, false positives included).
BLOOM_SALTS: list[tuple[int, int]] = [
    (_brng.randrange(1, FNV_MOD - 1), _brng.randrange(0, FNV_MOD - 1))
    for _ in range(BLOOM_K)
]


def _bloom_positions(h: Column) -> Column:
    """array<long> of the k bit positions for one gram hash."""
    return F.array(
        *[
            (((F.lit(a) * h + F.lit(b)) % FNV_MOD) % BLOOM_BITS).cast("long")
            for a, b in BLOOM_SALTS
        ]
    )


def bloom_bitset(
    benchmark: DataFrame, w: int = 13, text_col: str = "text"
) -> DataFrame:
    """One-row (wm: map<long,long>) sparse Bloom bitset over the benchmark
    set's distinct w-token grams: bit p lives at bit (p % 32) of word
    (p div 32); only non-zero words are stored. The build is two
    map-side-combinable distincts plus a bit_or aggregation — fully
    distributed, merged to one row only at the end (the bitwise-OR of
    per-partition partial masks IS the Bloom merge, which is what makes
    the sketch unionable across corpus shards)."""
    grams = benchmark.select(
        F.explode(F.array_distinct(tokens_shingles(F.col(text_col), w))).alias("g")
    ).distinct()
    pos = (
        grams.select(shingle_hash(F.col("g")).alias("h"))
        .select(F.explode(_bloom_positions(F.col("h"))).alias("p"))
        .distinct()
    )
    words = (
        pos.select(
            F.floor(F.col("p") / 32).alias("w"),
            (F.col("p") % 32).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), b)")).alias("m"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "m"))).alias("wm")
    )


def bloom_contamination(
    documents: DataFrame,
    benchmark: DataFrame | None = None,
    w: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bitset: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_grams, n_flagged_grams, contaminated): per-doc Bloom
    probe of every distinct w-gram against the benchmark bitset — the
    sketch-sized complement of `exact_ngram_matches` for when even the
    benchmark gram index is too big to broadcast (or must be shipped to
    another team as a fixed-size artifact). One-sided error by
    construction: a gram exactly present is ALWAYS flagged (no false
    negatives — the property decontamination needs); a false positive
    over-drops with probability ~(set_bits/m)^k. Deterministic given the
    salts, so the DuckDB oracle reproduces every answer including the
    false positives.

    Plan: the corpus side is one scan — gram explode, k affine probes,
    and a `forall` bit test against the BROADCAST one-row word map (no
    per-gram shuffle; the only exchange is the per-doc count agg). Docs
    with no w-gram (shorter than w tokens) have nothing to probe and drop
    out, as in the exact path."""
    wm = bitset if bitset is not None else bloom_bitset(benchmark, w, text_col)
    grams = documents.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_shingles(F.col(text_col), w))).alias("g"),
    )
    probed = (
        grams.select(id_col, shingle_hash(F.col("g")).alias("h"))
        .select(id_col, _bloom_positions(F.col("h")).alias("ps"))
        .crossJoin(F.broadcast(wm))
        .select(
            id_col,
            F.expr(
                "forall(ps, p -> (shiftright(coalesce(element_at(wm, p div 32),"
                " CAST(0 AS BIGINT)), CAST(p % 32 AS INT)) & 1) = 1)"
            ).alias("hit"),
        )
    )
    return probed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.col("hit").cast("long")).alias("n_flagged_grams"),
        (F.sum(F.col("hit").cast("long")) > 0).alias("contaminated"),
    )


# --------------------------------------------------------------------------
# duplicate-line removal (C4 / RefinedWeb-style repeated-span cleanup)
# --------------------------------------------------------------------------

def remove_duplicate_lines(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lines: Column | None = None,
    delim: str = "\n",
    within_doc: bool = False,
) -> DataFrame:
    """(doc_id, text): the corpus with every REPEATED line removed except
    its first occurrence — C4's "discard duplicate three-sentence spans" /
    RefinedWeb line-dedup generalized to any segmentation. "First" is the
    globally deterministic (min doc_id, min position) occurrence, so the
    result is independent of partitioning. Docs whose every line was a
    repeat come out with empty text (kept — dropping is the caller's
    policy decision).

    ``within_doc=True`` scopes the dedup to each document (the
    intra-document repetition cleanup step — a generated page repeating
    its own nav block): the rank partitions by (doc, line), other docs'
    identical lines are untouched, and the dedup shuffle key gains the
    doc id — which also removes the cross-corpus hot-line skew entirely.

    `lines` overrides the segmentation (default: split on `delim`); pass
    e.g. a fixed-width token chunker for corpora without line structure.

    Scale shape: ONE shuffle keyed by the line content ranks all
    occurrences (window row_number over (line) ordered by (doc, pos) — an
    equi-shuffle on the dedup key, the same key an exact-dedup groupBy
    would use), then one shuffle back on doc_id reassembles surviving
    lines in order. No self-join, no collect; skewed hot lines (boilerplate
    repeated millions of times) are exactly the rows the rank FILTERS, and
    AQE skew-split handles their sort."""
    from pyspark.sql import Window

    if lines is None:
        # F.split takes a REGEX; \Q...\E quotes the delimiter so '|'
        # or '.' segment literally (array_join below is literal already)
        lines = F.split(F.col(text_col), "\\Q" + delim + "\\E")
    exploded = documents.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "line")
    )
    part = (id_col, "line") if within_doc else ("line",)
    w_line = Window.partitionBy(*part).orderBy(id_col, "pos")
    kept = (
        exploded.withColumn("occ", F.row_number().over(w_line))
        .filter(F.col("occ") == 1)
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            delim,
        ).alias(text_col)
    )
    # docs whose every line was dropped need reinstating with empty text
    return (
        documents.select(id_col)
        .join(reassembled, id_col, "left")
        .select(id_col, F.coalesce(text_col, F.lit("")).alias(text_col))
    )


# --------------------------------------------------------------------------
# Repeated-span removal (Lee et al., "Deduplicating Training Data Makes
# Language Models Better", ACL 2022 — the ExactSubstr deduplicator),
# re-expressed relationally: the paper builds a suffix array and removes
# every substring ≥ L that repeats anywhere in the corpus; here every
# sliding L-TOKEN window is the repeat unit, which removes the same spans
# at token granularity without a distributed suffix array.
# --------------------------------------------------------------------------

def remove_repeated_spans(
    documents: DataFrame,
    span_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, text): every repeated ≥`span_tokens`-token span keeps only
    its globally-first occurrence (min (doc, start)); all other
    occurrences have their tokens removed and the doc is reassembled from
    the surviving tokens in order. Exact-duplicate docs collapse to one
    full copy + empty twins; a doc quoting a paragraph of another keeps
    its own prose around the removed quote — the behavior that motivates
    span-level (not doc-level) dedup.

    Plan: sliding L-gram explode → ONE rank shuffle keyed by the gram
    (row_number over (gram) by (doc, start) — first occurrence wins,
    deterministic) → repeat occurrences explode to their covered token
    positions (distinct) → anti-join against the token table → per-doc
    ordered reassembly. Every shuffle is equi-keyed (gram, (doc,pos),
    doc); hot boilerplate grams are precisely the rows the rank drops,
    and AQE splits their sort. No suffix array, no Python in the row
    path."""
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    L = span_tokens
    tok_tbl = documents.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "tok")
    )
    grams = documents.select(
        F.col(id_col),
        F.explode(
            F.when(n < L, F.array().cast("array<struct<s:int,g:string>>"))
            .otherwise(
                F.transform(
                    F.sequence(F.lit(0), n - L),
                    lambda s: F.struct(
                        s.cast("int").alias("s"),
                        F.array_join(F.slice(toks, s + 1, L), " ").alias("g"),
                    ),
                )
            )
        ).alias("sg"),
    ).select(id_col, F.col("sg.s").alias("s"), F.col("sg.g").alias("g"))
    w_g = Window.partitionBy("g").orderBy(id_col, "s")
    repeats = (
        grams.withColumn("occ", F.row_number().over(w_g))
        .filter(F.col("occ") > 1)
    )
    covered = repeats.select(
        id_col,
        F.explode(F.sequence(F.col("s"), F.col("s") + F.lit(L - 1))).alias("pos"),
    ).distinct()
    kept = tok_tbl.join(covered, [id_col, "pos"], "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias(text_col)
    )
    return (
        documents.select(id_col)
        .join(reassembled, id_col, "left")
        .select(id_col, F.coalesce(text_col, F.lit("")).alias(text_col))
    )


def incremental_corpus_merge(
    corpus: DataFrame,
    batch: DataFrame,
    threshold: float = 0.5,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Daily-increment corpus update: return ``corpus UNION (batch docs
    that survive dedup)``, flagged with ``is_new``. A batch doc survives
    iff it near-duplicates (verified shingle-Jaccard >= threshold)
    neither any corpus doc NOR any lower-id batch doc — so re-ingesting
    overlapping crawls never grows the corpus with near-twins, without
    ever re-deduplicating the existing corpus against itself.

    The intra-batch rule is the PAIRWISE one (drop the higher id of any
    qualifying pair, whether or not the lower id itself survives):
    deterministic, one band self-join, no iteration. Component-canonical
    semantics (keep one per connected near-dup cluster) are available by
    composing `connected_components` — the pairwise rule is the
    scale-cheapest and the difference only shows on chains A~B~C where
    A!~C.

    Scale shape: the corpus band index is built once (persist it across
    days — see band_table/near_dup_filter); each day's cost is banding
    the BATCH (small), one batch self-join, and one batch-vs-index
    equi-join. The corpus text never reshuffles; it flows straight to
    the output union."""
    # band the batch ONCE; the same persisted table feeds both sides of
    # the intra-batch self-join AND the batch-vs-corpus probe (banding is
    # the expensive part — shingle + signature computation)
    bb = band_table(batch, w, text_col, id_col).persist()
    bb.count()

    left = bb.select(
        "band", "bsig", F.col(id_col).alias("id1"), F.col("grams").alias("g1")
    )
    right = bb.select(
        F.col("band").alias("band_r"), F.col("bsig").alias("bsig_r"),
        F.col(id_col).alias("id2"), F.col("grams").alias("g2"),
    )
    intra_drop = (
        left.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("bsig") == F.col("bsig_r"))
            & (F.col("id1") < F.col("id2")),
        )
        .dropDuplicates(["id1", "id2"])
        .filter(jaccard_col(F.col("g1"), F.col("g2")) >= threshold)
        .select(F.col("id2").alias(id_col))
        .distinct()
    )
    if corpus_bands is None:
        # built inline as a convenience; a DAILY pipeline should build
        # the corpus index once, persist it (e.g. band_table(...).write),
        # and pass it here so each increment pays only batch-side banding
        corpus_bands = band_table(corpus, w, text_col, id_col)
    cb = corpus_bands.select(
        F.col("band").alias("c_band"), F.col("bsig").alias("c_bsig"),
        F.col("grams").alias("c_grams"),
    )
    cross_drop = (
        bb.join(
            cb,
            (F.col("band") == F.col("c_band"))
            & (F.col("bsig") == F.col("c_bsig")),
        )
        .filter(
            jaccard_col(F.col("grams"), F.col("c_grams")) >= threshold
        )
        .select(id_col)
        .distinct()
    )
    survivors = batch.join(
        intra_drop.unionByName(cross_drop), id_col, "left_anti"
    )
    return corpus.withColumn("is_new", F.lit(False)).unionByName(
        survivors.withColumn("is_new", F.lit(True))
    )


def lsh_recall_eval(
    documents: DataFrame,
    sample_mod: int = 2,
    threshold: float = 0.5,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Measure the MinHash-LSH banding's recall against EXACT ground truth
    on a deterministic sample — the pipeline evaluating its own
    approximation instead of asserting it. Returns ONE row:
    (n_sample_docs, n_exact_pairs, n_lsh_pairs, n_common, recall,
    precision). recall and precision are NULL when their denominator is
    zero (a clean sample with no near-dup pairs — "undefined", not 0;
    guard consumers accordingly). When pairs exist, precision is 1.0 by
    construction (banded candidates are exact-verified); recall < 1
    exposes band misses — re-run with more bands/rows when it drops
    below target.

    The ground truth is an all-pairs join OVER THE SAMPLE ONLY —
    O(s²) BY DESIGN: at corpus scale you cannot brute-force the full
    pair set (that's why LSH exists); sampling k docs and measuring on
    the sample is the honest evaluation pattern. `sample_mod` picks
    every m-th id deterministically so the oracle sees the same
    sample."""
    from yat_geo_db_spark.pipelines.text import token_shingles_col

    sample = documents.filter(F.col(id_col) % sample_mod == 0)
    shing = sample.select(
        F.col(id_col),
        F.array_distinct(
            token_shingles_col(F.col(text_col), w)
        ).alias("grams"),
    )
    a = shing.select(F.col(id_col).alias("id1"), F.col("grams").alias("g1"))
    b = shing.select(F.col(id_col).alias("id2"), F.col("grams").alias("g2"))
    exact = (
        a.join(b, F.col("id1") < F.col("id2"))
        .filter(jaccard_col(F.col("g1"), F.col("g2")) >= threshold)
        .select("id1", "id2", F.lit(1).alias("in_exact"))
    )
    lsh = minhash_lsh_pairs(sample, threshold, w, text_col, id_col).select(
        "id1", "id2", F.lit(1).alias("in_lsh")
    )
    merged = exact.join(lsh, ["id1", "id2"], "full_outer")
    counts = merged.agg(
        F.count("in_exact").alias("n_exact_pairs"),
        F.count("in_lsh").alias("n_lsh_pairs"),
        F.count(
            F.when(F.col("in_exact").isNotNull() & F.col("in_lsh").isNotNull(), 1)
        ).alias("n_common"),
    )
    n_docs = sample.agg(F.count(F.lit(1)).alias("n_sample_docs"))
    return n_docs.crossJoin(counts).select(
        "n_sample_docs",
        "n_exact_pairs",
        "n_lsh_pairs",
        "n_common",
        # ANSI guard: a clean corpus sample has zero exact (or zero LSH)
        # near-dup pairs — unguarded division aborts the job with
        # DIVIDE_BY_ZERO under Spark 4's ANSI default. NULL recall on an
        # empty denominator is the honest answer ("undefined"), not 0.
        F.round(
            F.when(
                F.col("n_exact_pairs") > 0,
                F.col("n_common") / F.col("n_exact_pairs"),
            ),
            6,
        ).alias("recall"),
        F.round(
            F.when(
                F.col("n_lsh_pairs") > 0, F.col("n_common") / F.col("n_lsh_pairs")
            ),
            6,
        ).alias("precision"),
    )


# --------------------------------------------------------------------------
# sorted-neighborhood blocking (Hernández & Stolfo SIGMOD'95)
# --------------------------------------------------------------------------

def global_rank(
    df: DataFrame,
    sort_cols: list[str],
    rank_col: str = "rank",
    n_parts: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """Dense 1-based global rank by `sort_cols` WITHOUT a single-partition
    window: range-partition on the sort key, count rows per partition (a
    tiny n_parts-row aggregate), broadcast the cumulative offsets back,
    and add a PARTITION-LOCAL row_number. The only data movement is the
    range shuffle every global sort pays anyway — no stage ever sees more
    than one partition's rows in one task (the 100 TB property a bare
    `row_number() OVER (ORDER BY ...)` violates).

    `sort_cols` must be a total order (tie-break with a unique id) or
    ranks are nondeterministic. The range-partitioned frame is
    localCheckpoint'ed so the sampled partition boundaries cannot drift
    between the counting job and the ranking job."""
    ranged = df.repartitionByRange(n_parts, *sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    if checkpoint:
        # The checkpoint is LOAD-BEARING for correctness, not a lineage
        # nicety: the counts job and the ranking job would otherwise each
        # re-execute repartitionByRange, whose boundary sampling can
        # differ between jobs — offsets then mismatch actual partition
        # contents and ranks duplicate/skip. checkpoint=False exists ONLY
        # for plan-shape inspection (the executed plan otherwise starts at
        # an ExistingRDD stub); never use it for real results.
        ranged = ranged.localCheckpoint(eager=False)
    # cumulative offsets computed DISTRIBUTED-SIDE (VERDICT r13 #4): the
    # former collect()-and-createDataFrame round trip ran the counting
    # aggregate as its own blocking driver job per global_rank call
    # (curate_rank_mix pays this twice); as a window over the tiny
    # n_parts-row count table the offsets build fuses into the
    # consumer's job as a broadcast-exchange stage instead. The window
    # is single-partition by construction — over ≤ n_parts rows, never
    # data — and both the counts subtree and the ranking read the SAME
    # checkpointed frame, so the boundary-sampling determinism argument
    # above is unchanged. Offsets are identical: sum of counts over
    # lower pids, 0 for the first.
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    off_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_df = F.broadcast(
        counts.select(
            "_pid",
            F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off"),
        )
    )
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    return (
        ranged.join(off_df, "_pid")
        .withColumn(rank_col, F.row_number().over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )


def sorted_neighborhood_pairs(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    key_len: int = 16,
    threshold: float = 0.5,
    n_parts: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking: sort the corpus by
    a cheap normalized key (first `key_len` alphanumerics), slide a
    `window`-row neighborhood down the sorted order, and verify the
    candidate pairs with exact 3-gram Jaccard. Finds the near-dups whose
    variants sort together (prefixed titles, boilerplate headers, typo'd
    tails) at O(n·w) candidate volume — the classic complement to
    LSH-style content blocking when the dirt is AT THE END of the string.

    Scale shape: one range shuffle for the global rank (global_rank — no
    single-partition window), then candidates come from an EQUI-join of
    rank+d against rank for d in 1..window-1 (a `window-1`-row explode of
    the left side, never a band/theta join). The rank frames carry ONLY
    (id, key, rank) — gram arrays join onto the O(n·w) candidate pairs
    afterwards (two id-keyed equi-joins), instead of riding the range
    shuffle and being duplicated window-1× through the explode (measured
    2.3× on the sf0.1 bench). Output: (id_a, id_b, jaccard) with id_a's
    rank below id_b's."""
    if window < 2:
        raise ValueError(
            f"window must be >= 2 (got {window}): window=1 has no "
            "neighbors, and the rank+1..rank+window-1 probe sequence "
            "would run BACKWARDS and emit self-pairs"
        )
    key = F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""),
        1,
        key_len,
    )
    base = documents.select(
        F.col(id_col).alias("_id"),
        key.alias("_key"),
    )
    ranked = global_rank(
        base, ["_key", "_id"], rank_col="_rank", n_parts=n_parts,
        checkpoint=checkpoint,
    )
    probes = ranked.select(
        F.col("_id").alias("id_a"),
        F.explode(
            F.sequence(F.col("_rank") + 1, F.col("_rank") + (window - 1))
        ).alias("_rank"),
    )
    cand = probes.join(
        ranked.select(F.col("_rank"), F.col("_id").alias("id_b")),
        "_rank",
    )
    # pin the verify's parallelism while the pairs are still NARROW
    # (id_a, id_b): at runtime AQE converts the rank equi-join to a
    # broadcast join and coalesces the tiny range-shuffle partitions,
    # which fused the whole downstream verify — O(n·w) array_intersect
    # calls over multi-KB gram arrays — into ONE task (measured: a
    # single ~2.9 s CPU task at sf0.1 while 31 cores idled). An
    # explicit round-robin repartition of the candidate pairs (bytes:
    # two longs per row) is AQE-stable, spreads the verify across the
    # session's parallelism, and keeps the heavy gram arrays attaching
    # AFTER the exchange (guide §8: shuffle the proxy, not the payload)
    cand = cand.repartition(n_parts)
    # verify on HASHED shingles: the polynomial gram hash runs ONCE per
    # doc (O(chars)), so each of the O(n·w) pair intersections compares
    # longs instead of re-hashing strings — measured 1.7× on the sf0.1
    # bench. shingle_hash has an exact DuckDB mirror (_hash_fold), so
    # hash collisions (which merge grams pre-distinct) are identical on
    # both engines and the oracle stays bit-aligned.
    grams = documents.select(
        F.col(id_col).alias("_gid"),
        F.array_distinct(
            F.transform(
                char_ngrams(F.lower(F.col(text_col))), shingle_hash
            )
        ).alias("_g"),
    )
    if checkpoint:
        grams = grams.localCheckpoint()
    paired = cand.join(
        grams.select(F.col("_gid").alias("id_a"), F.col("_g").alias("_ga")),
        "id_a",
    ).join(
        grams.select(F.col("_gid").alias("id_b"), F.col("_g").alias("_gb")),
        "id_b",
    )
    # lossless PPJoin length filter: J(a,b) >= t forces
    # min(|a|,|b|) >= t * max(|a|,|b|) — prune with two cheap size()
    # reads before paying the per-pair array_intersect (which dominates
    # the operator's cost: measured 5.3 s of 6.3 s at sf0.1 pre-filter)
    sized = paired.select(
        "id_a",
        "id_b",
        "_ga",
        "_gb",
        F.size("_ga").alias("_la"),
        F.size("_gb").alias("_lb"),
    ).where(
        F.least("_la", "_lb").cast("double")
        >= F.lit(threshold) * F.greatest("_la", "_lb").cast("double")
    )
    return (
        sized.select(
            "id_a",
            "id_b",
            jaccard_col(F.col("_ga"), F.col("_gb")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
