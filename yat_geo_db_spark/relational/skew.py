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

from pyspark.sql import Column, DataFrame
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
