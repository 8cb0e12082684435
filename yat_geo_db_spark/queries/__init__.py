"""Named query registry — the driver contract surface.

Each entry maps a query name to a `(spark_fn, oracle_sql)` pair:
`spark_fn(spark, sf_dir) -> DataFrame` is the engine implementation;
`oracle_sql` is the equivalent DuckDB SQL over the same parquet tables
(None for non-SQL-expressible ops → driver runs a rows-only check).
"""

from __future__ import annotations

import glob
import json
import os
import re

from yat_geo_db_spark.queries.geo_queries import QUERIES as GEO_QUERIES
from yat_geo_db_spark.queries.relational_queries import QUERIES as REL_QUERIES
from yat_geo_db_spark.queries.pipeline_queries import QUERIES as PIPE_QUERIES


def _last_checked_round() -> dict[str, int]:
    """name → most recent round with a GOOD driver CORRECTNESS row for it.

    The per-round driver checks the FIRST ~50 registry entries and records
    them in CORRECTNESS_r{N}.json, and it REGENERATES the testdata between
    rounds — so a verdict's evidential value decays with age. Reading the
    record files (committed at the repo root) lets `all_queries()` order
    STALEST-FIRST automatically each round: never-checked queries run
    first, then the oldest-checked, and the freshest rows — safest to lose
    to a time cap — run last. No hand-maintained round list to rotate.

    A sampled-but-FAILED row (error, or hash mismatch) does NOT count as
    checked: the fixed query must re-enter the driver's window next round
    to flip green (r3: pipe_emb_pca crashed the canonicalizer; without
    this it would have sat at idx 115 for two rounds). Rows-only successes
    (err == "no_oracle" with a recorded spark_rows count) DO count —
    they re-sort first forever otherwise, squatting the window."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            good = (err is None and row.get("hash_match") is True) or (
                err == "no_oracle" and row.get("spark_rows") is not None
            )
            if good:
                last[name] = max(last.get(name, 0), rnd)
    return last


def all_queries() -> dict:
    merged = {}
    for d in (GEO_QUERIES, REL_QUERIES, PIPE_QUERIES):
        overlap = merged.keys() & d.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        merged.update(d)
    last = _last_checked_round()
    # stalest-first; deterministic name tiebreak (never-checked sort at -1)
    return dict(
        sorted(merged.items(), key=lambda kv: (last.get(kv[0], -1), kv[0]))
    )
