"""Skew mitigation: manual key salting for equi-joins.

AQE's skew-join splitting (on by default in session.py) handles most skew
at runtime; salting is the explicit fallback for pathological single-key
hotspots (e.g. a null-ish default key holding 30% of a 100 TB fact table),
and for engines/stages where AQE can't apply (e.g. streaming joins).

Pattern: the large side appends a deterministic salt in [0, salts); the
small side is replicated `salts` times; the join key becomes
(key, salt) — the hot key's rows now spread across `salts` reducers.
Result is row-identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_src: Column,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large ⋈ small` on column `on`, salted `salts` ways.

    `salt_src` is any deterministic expression over the large side used to
    derive the salt (a row id, a line number, a high-cardinality column) —
    determinism keeps retries/speculative tasks consistent.
    """
    salt = F.pmod(F.hash(salt_src), F.lit(salts))
    large_s = large.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = large_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def skew_report(
    df: DataFrame, key_cols: list[str], top_k: int = 10
) -> DataFrame:
    """Heavy-hitter key diagnostic — the profiling step that DECIDES
    whether a join needs salting/AQE skew handling: per-key row counts,
    each key's share of the table, its ratio to a perfectly uniform
    key, and the cumulative share of the top keys. Read it as 'key X
    holds N× its fair share; the top 3 keys are 40% of the table'.

    Scale shape: one map-side-combinable groupBy(key) count, a 2-column
    1-row totals aggregate broadcast back, and a top_k TakeOrdered — no
    global sort of the key distribution, no collect."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = F.broadcast(
        counts.agg(
            F.sum("n_rows").alias("_total"),
            F.count(F.lit(1)).alias("_n_keys"),
        )
    )
    enriched = counts.crossJoin(totals).select(
        *key_cols,
        "n_rows",
        F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        F.round(
            F.col("n_rows")
            / (F.col("_total") / F.col("_n_keys").cast("double")),
            4,
        ).alias("x_uniform"),
    )
    # top-k selection is a TakeOrderedAndProject (distributed partial
    # top-k, never a global sort of the key distribution); the ranking
    # window then runs over <= top_k rows only
    top = enriched.orderBy(F.desc("n_rows"), *key_cols).limit(top_k)
    w = Window.orderBy(F.desc("n_rows"), *key_cols)
    return top.withColumn("rank", F.row_number().over(w)).withColumn(
        "cum_share",
        F.round(
            F.sum("share").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            6,
        ),
    )


def skewed_count_distinct(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """COUNT(DISTINCT v) per key in two shuffle-spread phases: first a
    distinct over (key, value) — spread across reducers by the VALUE,
    so a hot key's millions of rows fan out instead of landing on one
    task — then a plain count per key over the already-distinct pairs.
    Row-identical to groupBy(key).agg(count_distinct(v)) (oracle-
    checked); the difference is purely where the hot key's work
    happens. This is the aggregation sibling of salted_join: use it
    when one key holds a double-digit share of the table and the
    single-phase distinct stalls on its reducer. NULL values are not
    counted (count_distinct semantics)."""
    pairs = (
        df.filter(F.col(value_col).isNotNull())
        .select(*key_cols, value_col)
        .distinct()
    )
    return pairs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_distinct")
    )


def _bloom_positions(key: Column, m_bits: int, k_hashes: int) -> Column:
    """Array of k bit positions in [0, m_bits) for a join key — Murmur3
    with k distinct literal seeds mixed in as an extra hash argument, so
    build and probe sides derive identical positions from identical
    expressions."""
    return F.array(
        *[
            F.pmod(F.hash(key, F.lit(h)), F.lit(m_bits))
            for h in range(k_hashes)
        ]
    )


def _bit_mask(pos: Column) -> Column:
    # variable-distance shift: the SQL shiftleft accepts a column count
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
    )


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k_hashes: int = 4
) -> list[int]:
    """Fold a key set into an m_bits Bloom bitmap, returned as the dense
    list of m_bits/64 longs (8 KiB at the default — a sketch, not data).

    Scale shape: positions explode to k rows per DISTINCT key, a
    map-side-combinable groupBy(word) bit_or reduces to <= m_bits/64
    state rows, and only that tiny word table is collected. The key
    table itself never moves beyond its distinct pass."""
    n_words = m_bits // 64
    words = (
        keys.select(F.col(key_col).alias("_k"))
        .where(F.col("_k").isNotNull())
        .distinct()
        .select(
            F.explode(
                _bloom_positions(F.col("_k"), m_bits, k_hashes)
            ).alias("_pos")
        )
        .select(
            (F.col("_pos") / 64).cast("int").alias("_word"),
            _bit_mask(F.col("_pos")).alias("_mask"),
        )
        .groupBy("_word")
        .agg(F.bit_or("_mask").alias("_bits"))
        .collect()
    )
    dense = [0] * n_words
    for row in words:
        dense[row["_word"]] = row["_bits"]
    return dense


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int, k_hashes: int
) -> Column:
    """Membership test as a pure codegen'd Column expression over the
    literal word array — every one of the k probed bits must be set.
    No false negatives; false-positive rate ~ (1 - e^(-kn/m))^k."""
    arr = F.array(*[F.lit(w) for w in words])
    out = None
    for h in range(k_hashes):
        pos = F.pmod(F.hash(key, F.lit(h)), F.lit(m_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + F.lit(1))
        check = word.bitwiseAND(_bit_mask(pos)) != F.lit(0)
        out = check if out is None else (out & check)
    return out


def bloom_pruned_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Inner/semi equi-join where the LARGE side is pre-filtered by a
    Bloom sketch of the small side's (already filtered) key set — the
    explicit form of Spark's runtime bloom filter
    (spark.sql.optimizer.runtime.bloomFilter.enabled), for when the
    planner's stats won't trigger it or the probe side comes from a
    stream. The sketch pass costs one distinct over the SMALL side;
    the payoff at 100 TB is that non-matching fact rows die at the
    scan, BEFORE the shuffle for the join — the shuffle moves only
    probable matches (plus the bounded false-positive mass). The
    join itself then removes false positives, so the result is
    row-identical to the plain join (oracle-checked).

    Use when the small side is too big to broadcast (so the join is
    shuffle-bound) but its key set still fits a sketch: 1M keys at
    m=2^23 is 1 MiB of literal array for ~2% fp."""
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(f"bloom pruning preserves semantics only for inner/semi joins, got {how!r}")
    words = bloom_build(small, on, m_bits=m_bits, k_hashes=k_hashes)
    pruned = large.where(
        bloom_might_contain(F.col(on), words, m_bits, k_hashes)
    )
    return pruned.join(small, on, how)


def join_explosion_report(
    left: DataFrame,
    right: DataFrame,
    on: str,
    top_k: int = 10,
) -> DataFrame:
    """Pre-join blowup diagnostic: for an equi-join on `on`, the exact
    output-row contribution of each key is n_left(k) × n_right(k) — a
    single hot key on BOTH sides multiplies, and this report names the
    keys that would dominate the output BEFORE you pay for the join
    (the check that catches the accidental many-to-many). Returns the
    top_k keys by produced rows with both side counts, the product,
    and its share of the total join output.

    Scale shape: one groupBy(key) count per side, an equi-join of the
    two KEY-COUNT tables (key-cardinality-bounded, not row-bounded), a
    1-row total broadcast back, TakeOrdered top_k. The fact tables
    themselves are scanned once each and never joined."""
    lc = left.groupBy(F.col(on)).agg(F.count(F.lit(1)).alias("n_left"))
    rc = right.groupBy(F.col(on)).agg(F.count(F.lit(1)).alias("n_right"))
    prod = lc.join(rc, on).select(
        on,
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).alias("out_rows"),
    )
    total = F.broadcast(prod.agg(F.sum("out_rows").alias("_total")))
    return (
        prod.crossJoin(total)
        .select(
            on,
            "n_left",
            "n_right",
            "out_rows",
            F.round(F.col("out_rows") / F.col("_total"), 6).alias(
                "share_of_join"
            ),
        )
        .orderBy(F.desc("out_rows"), on)
        .limit(top_k)
    )
