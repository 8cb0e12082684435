"""The bench stdout-line contract (VERDICT r13 #1): the one JSON line the
driver captures must (a) always fit the byte budget and (b) carry a
NAME-STABLE per-query map — which rows are elided is pinned in bench.py,
never re-decided from a run's own timings (rounds 12-13 manufactured
phantom dropped/new queries because the elided set drifted with noise).

Pure-Python tests (no Spark): they pin the arithmetic of bench.main()'s
emission block against the committed HEADLINE list.
"""

from __future__ import annotations

import json

import bench


def _emit(timings: dict[str, float], budget: int = 1900) -> dict:
    """Replay bench.main()'s emission block verbatim over `timings`."""
    inline = {n: round(t, 2) for n, t in timings.items()}
    elided = 0
    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "queries": inline,
    }
    for name in bench._ELIDE_PRIORITY[: bench._ELIDE_ALWAYS]:
        if name in inline:
            del inline[name]
            elided += 1
    payload["queries_elided"] = elided
    line = json.dumps(payload, separators=(",", ":"))
    overflow = [
        n for n in bench._ELIDE_PRIORITY[bench._ELIDE_ALWAYS:] if n in inline
    ] + sorted(n for n in inline if n not in bench._ELIDE_PRIORITY)
    for name in overflow:
        if len(line) <= budget:
            break
        del inline[name]
        elided += 1
        payload["queries_elided"] = elided
        line = json.dumps(payload, separators=(",", ":"))
    return {"line": line, "payload": payload, "inline": inline}


def test_pinned_elision_names_are_headline_rows():
    """Every pinned/overflow name must be a real HEADLINE line (a typo
    here would silently elide nothing and overflow the budget), and the
    always-elided prefix is exactly the seven names the r13 stdout line
    already elided — so the driver's map diff sees no drops."""
    assert set(bench._ELIDE_PRIORITY) <= set(bench.HEADLINE)
    assert bench._ELIDE_PRIORITY[: bench._ELIDE_ALWAYS] == [
        "rel_interval_join",
        "pipe_sim_topk_brute",
        "pipe_text_quality",
        "pipe_text_fingerprint",
        "rel_q6_forecast_revenue",
        "pipe_pii_scrub",
        "pipe_html_extract",
    ]
    # no duplicates (a repeated name would double-count queries_elided)
    assert len(set(bench._ELIDE_PRIORITY)) == len(bench._ELIDE_PRIORITY)


def test_line_fits_budget_at_realistic_values_with_no_overflow():
    """At sub-10 s per-query values (every line on record is <6 s) the
    full 74-name map minus the seven pinned rows must fit the 1900-byte
    budget WITHOUT touching the overflow order — i.e. the stdout map
    carries the same 67 names every round."""
    timings = {n: 9.99 for n in bench.HEADLINE}
    out = _emit(timings)
    assert len(out["line"]) <= 1900
    assert out["payload"]["queries_elided"] == bench._ELIDE_ALWAYS
    expected = set(bench.HEADLINE) - set(
        bench._ELIDE_PRIORITY[: bench._ELIDE_ALWAYS]
    )
    assert set(out["inline"]) == expected


def test_overflow_elision_is_deterministic_in_names():
    """Degenerate-value runs (everything ≥100 s) must still emit a
    parseable under-budget line, and the extra elisions must follow the
    committed priority order — never the run's own timings."""
    timings = {n: 100.0 + i for i, n in enumerate(bench.HEADLINE)}
    out = _emit(timings)
    assert len(out["line"]) <= 1900
    parsed = json.loads(out["line"])
    assert parsed["queries_elided"] == len(bench.HEADLINE) - len(
        parsed["queries"]
    )
    gone = set(bench.HEADLINE) - set(parsed["queries"])
    n_overflow = len(gone) - bench._ELIDE_ALWAYS
    assert n_overflow > 0
    expected_overflow = set(
        bench._ELIDE_PRIORITY[
            bench._ELIDE_ALWAYS: bench._ELIDE_ALWAYS + n_overflow
        ]
    )
    assert gone == set(
        bench._ELIDE_PRIORITY[: bench._ELIDE_ALWAYS]
    ) | expected_overflow
