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
