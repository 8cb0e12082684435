"""Code-change-aware driver rotation (VERDICT r12 task 1).

The stalest-first window previously ordered by last driver-green round
only, so a query whose implementation changed AFTER its green check kept
its (now stale) vintage and waited ~5 rounds for re-verification. The
committed QUERY_FINGERPRINTS.json sidecar pins the source fingerprint each
green row actually vouches for; a mismatch at load time re-sorts the row
to the never-checked front of the window.
"""

from __future__ import annotations

import json

from yat_geo_db_spark.queries import (
    _last_checked_round,
    _load_fingerprints,
    all_queries,
    query_fingerprint,
    sync_fingerprints,
)


def _green_names():
    last, _ = _last_checked_round()
    return last


def test_touched_row_resorts_to_front():
    """A green-round row whose sidecar fingerprint mismatches its current
    source must order before EVERY row whose fingerprint still matches."""
    last = _green_names()
    order_base = list(all_queries().keys())
    # pick the FRESHEST green row — worst case for staleness ordering
    victim = max(last, key=lambda n: (last[n], n))
    assert order_base.index(victim) > len(order_base) // 2
    fps = {victim: {"round": last[victim], "fp": "deliberately-wrong"}}
    order = list(all_queries(fingerprints=fps).keys())
    i = order.index(victim)
    # every name after a matching-or-absent fingerprint with a green round
    # must come later than the touched row
    for other in order[:i]:
        assert last.get(other, -1) == -1 or other < victim, (
            f"{other} (round {last.get(other)}) ordered before touched row"
        )
    assert i < 50, "touched row must land inside the 50-row driver window"


def test_matching_fingerprint_keeps_order():
    last = _green_names()
    victim = max(last, key=lambda n: (last[n], n))
    pair = all_queries()[victim]
    fps = {victim: {"round": last[victim], "fp": query_fingerprint(*pair)}}
    assert list(all_queries(fingerprints=fps).keys()) == list(all_queries(fingerprints={}).keys())


def test_committed_sidecar_covers_registry():
    """Every driver-green name has a sidecar entry, and entries for
    dropped names don't linger."""
    fps = _load_fingerprints()
    last = _green_names()
    merged = all_queries(fingerprints={})
    assert set(fps) == set(last) & set(merged)
    for name, ent in fps.items():
        assert ent["round"] <= last[name]


def test_devacuated_survival_resolved_by_driver_regreen():
    """The r13 scenario this file was built for, now at its RESOLVED
    fixpoint: pipe_user_survival (fixed in r12 after its r11 vacuous
    green) re-entered the driver's 50-row window via the sidecar's
    invalidated fingerprint and was re-greened in r13
    (CORRECTNESS_r13: hash_match true). The sidecar must now vouch for
    it at that round with a fingerprint matching the current source —
    i.e. the row has legitimately LEFT the stale-first front and the
    mechanism closed the loop."""
    fps = _load_fingerprints()
    ent = fps.get("pipe_user_survival")
    assert ent is not None and ent["round"] >= 13
    pair = all_queries(fingerprints={})["pipe_user_survival"]
    assert ent["fp"] == query_fingerprint(*pair)


def test_sync_never_downgrades_or_rewrites_same_round(tmp_path):
    """sync_fingerprints must not overwrite an entry whose round is
    unchanged — a drifted source stays mismatched until the driver
    re-greens it — and must refresh when a newer green round exists."""
    path = tmp_path / "fps.json"
    last = _green_names()
    victim = max(last, key=lambda n: (last[n], n))
    stale = {victim: {"round": last[victim], "fp": "stale-pin"}}
    path.write_text(json.dumps(stale))
    out = sync_fingerprints(path=str(path))
    assert out[victim] == {"round": last[victim], "fp": "stale-pin"}
    # now simulate an OLDER recorded round → sync refreshes to current fp
    older = {victim: {"round": last[victim] - 1, "fp": "stale-pin"}}
    path.write_text(json.dumps(older))
    out = sync_fingerprints(path=str(path))
    pair = all_queries(fingerprints={})[victim]
    assert out[victim] == {
        "round": last[victim],
        "fp": query_fingerprint(*pair),
    }
    on_disk = json.loads(path.read_text())
    assert on_disk[victim]["fp"] == out[victim]["fp"]
