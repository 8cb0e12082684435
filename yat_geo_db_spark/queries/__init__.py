"""Named query registry — the driver contract surface.

Each entry maps a query name to a `(spark_fn, oracle_sql)` pair:
`spark_fn(spark, sf_dir) -> DataFrame` is the engine implementation;
`oracle_sql` is the equivalent DuckDB SQL over the same parquet tables
(None for non-SQL-expressible ops → driver runs a rows-only check).
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re

from yat_geo_db_spark.queries.geo_queries import QUERIES as GEO_QUERIES
from yat_geo_db_spark.queries.relational_queries import QUERIES as REL_QUERIES
from yat_geo_db_spark.queries.pipeline_queries import QUERIES as PIPE_QUERIES

#: committed sidecar mapping query name → {"round": N, "fp": hex} — the
#: fingerprint each query carried when the driver last hash-verified it.
#: Maintained by sync_fingerprints() at round START (before any code edit),
#: so a mismatch at load time means the implementation or oracle changed
#: AFTER its last driver green — the row must re-enter the driver window.
FINGERPRINT_SIDECAR = "QUERY_FINGERPRINTS.json"


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def query_fingerprint(fn, oracle_sql) -> str:
    """Shallow source fingerprint of one registry entry: sha256 over the
    query callable's source text plus its oracle SQL. Deliberately NOT
    transitive into library modules — the rotation exists to resurface
    rows whose own definition changed (VERDICT r12 task 1: a query fixed
    after its last green driver check must not wait ~5 rounds on pure
    staleness); library-level changes are covered by the oracle-parity
    test suite every session."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # builtins / C callables — stable anchor
        src = repr(getattr(fn, "__qualname__", fn))
    h = hashlib.sha256()
    h.update(src.encode("utf-8"))
    h.update(b"\x00")
    h.update((oracle_sql or "").encode("utf-8"))
    return h.hexdigest()[:16]


def _load_fingerprints() -> dict:
    path = os.path.join(_repo_root(), FINGERPRINT_SIDECAR)
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


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


def all_queries(fingerprints: dict | None = None) -> dict:
    merged = {}
    for d in (GEO_QUERIES, REL_QUERIES, PIPE_QUERIES):
        overlap = merged.keys() & d.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        merged.update(d)
    last, rows_only_latest = _last_checked_round()
    fps = _load_fingerprints() if fingerprints is None else fingerprints

    def key(name: str) -> tuple[int, str]:
        rnd = last.get(name, -1)
        # a query whose only driver evidence is rows-only but which NOW
        # carries an oracle has never had its hash verified — treat as
        # never-checked so it enters the next driver window
        if name in rows_only_latest and merged[name][1] is not None:
            rnd = -1
        # code-change awareness (VERDICT r12 task 1): a green driver row
        # only vouches for the SOURCE it checked. If the sidecar's recorded
        # fingerprint no longer matches the current definition, the row's
        # evidence is stale regardless of round — treat as never-checked so
        # the driver re-hashes it THIS round. A name with a green round but
        # no sidecar entry is a row greened after the last sync; trust the
        # round (sync runs each round start, so the gap is ≤ 1 round and
        # the source was by construction unchanged when the driver ran).
        if rnd >= 0:
            ent = fps.get(name)
            if isinstance(ent, dict) and ent.get("fp") != query_fingerprint(*merged[name]):
                rnd = -1
        return (rnd, name)

    # stalest-first; deterministic name tiebreak (never-checked sort at -1)
    return dict(sorted(merged.items(), key=lambda kv: key(kv[0])))


def sync_fingerprints(path: str | None = None) -> dict:
    """Round-start maintenance: record the CURRENT fingerprint for every
    query at its latest driver-green round. Run BEFORE editing any query
    code (the working tree still equals what the driver checked, so the
    current fingerprint IS the checked fingerprint). Never downgrades a
    recorded round and never rewrites an entry whose round is unchanged —
    if the source drifted since that sync, the entry MUST stay mismatched
    until the driver re-greens it. Entries for names no longer in the
    registry are dropped. Returns the written mapping."""
    if path is None:
        path = os.path.join(_repo_root(), FINGERPRINT_SIDECAR)
    merged = {}
    for d in (GEO_QUERIES, REL_QUERIES, PIPE_QUERIES):
        merged.update(d)
    last, _ = _last_checked_round()
    try:
        with open(path) as f:
            existing = json.load(f)
        if not isinstance(existing, dict):
            existing = {}
    except (OSError, ValueError):
        existing = {}
    out: dict = {}
    for name, pair in merged.items():
        rnd = last.get(name)
        if rnd is None:
            continue  # never driver-green — nothing to vouch for
        ent = existing.get(name)
        if isinstance(ent, dict) and ent.get("round", -1) >= rnd:
            out[name] = ent  # no fresher driver evidence — keep as-is
        else:
            out[name] = {"round": rnd, "fp": query_fingerprint(*pair)}
    with open(path, "w") as f:
        json.dump(dict(sorted(out.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    return out


if __name__ == "__main__":  # pragma: no cover — round-start CLI
    synced = sync_fingerprints()
    print(f"synced {len(synced)} fingerprints → {FINGERPRINT_SIDECAR}")
