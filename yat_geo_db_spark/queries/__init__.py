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


def _last_checked_round() -> tuple[dict[str, int], set[str]]:
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
    they re-sort first forever otherwise, squatting the window — but the
    second return value reports the names whose LATEST good check was
    rows-only, so all_queries() can resurface a query that has since
    GAINED an oracle (its hash has never been driver-verified)."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last: dict[str, int] = {}
    rows_only_at: dict[str, int] = {}
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
            if err is None and row.get("hash_match") is True:
                last[name] = max(last.get(name, 0), rnd)
            elif err == "no_oracle" and row.get("spark_rows") is not None:
                last[name] = max(last.get(name, 0), rnd)
                rows_only_at[name] = max(rows_only_at.get(name, 0), rnd)
    rows_only_latest = {
        n for n, rnd in rows_only_at.items() if last.get(n) == rnd
    }
    return last, rows_only_latest


def all_queries() -> dict:
    merged = {}
    for d in (GEO_QUERIES, REL_QUERIES, PIPE_QUERIES):
        overlap = merged.keys() & d.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        merged.update(d)
    last, rows_only_latest = _last_checked_round()

    def key(name: str) -> tuple[int, str]:
        rnd = last.get(name, -1)
        # a query whose only driver evidence is rows-only but which NOW
        # carries an oracle has never had its hash verified — treat as
        # never-checked so it enters the next driver window
        if name in rows_only_latest and merged[name][1] is not None:
            rnd = -1
        return (rnd, name)

    # stalest-first; deterministic name tiebreak (never-checked sort at -1)
    return dict(sorted(merged.items(), key=lambda kv: key(kv[0])))
