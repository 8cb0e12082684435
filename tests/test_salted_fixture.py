"""Extreme-panel salt fixture invariants (VERDICT r12 task 6): tokens
must be copy-unique for c ≥ 17 so the cross-copy shared-gram term over
salt tokens is exactly zero — the ~(scale/26³)·N² alphabet-collision
residue no longer pollutes the candidate-estimate linearity telemetry
at 100×. Token LENGTH must stay 7 chars (the abandoned suffix variant
measured 6.6× of linear at 100× purely from the +3-char gram-mass
inflation). Copies ≤ 16 must stay bit-identical to every prior round's
fixtures (legacy z+body+reverse shape, disjoint window alphabets)."""

from __future__ import annotations

import pytest

import bench_scaling as bs


def _tokens(c, n_positions=60):
    """Reconstruct the token set per copy exactly as _salted_doc_copy
    emits it (lead + body + tail over odd positions)."""
    alpha = bs._salt_alphabet(c)
    lead, tail = bs._token_parts(c)
    out = set()
    for i in range(1, n_positions, 2):
        body = "".join(alpha[int(d)] for d in f"{i:03d}")
        out.add(lead + body + (body[::-1] if tail is None else tail))
    return out


def test_token_shape_and_length():
    # ≤ 16: legacy z+body+reverse — bit-identical fixtures
    for c in (0, 7, 16):
        lead, tail = bs._token_parts(c)
        assert lead == "z" and tail is None
    # ≥ 17: y-lead + constant 3-letter copy code, same 7-char length
    for c in (17, 99, 675):
        lead, tail = bs._token_parts(c)
        assert lead == "y" and len(tail) == 3
    assert all(len(t) == 7 for c in (0, 16, 17, 99) for t in _tokens(c))
    # copy codes injective over any plausible panel scale
    tails = [bs._token_parts(c)[1] for c in range(17, 1000)]
    assert len(set(tails)) == len(tails)


def test_salt_tokens_copy_unique_at_scale():
    """ZERO pairwise token sharing across 100 copies — including the
    ≥17 cohort where the old scheme leaked ~1/676 per token and the
    mixed (≤16, ≥17) pairs (distinct lead chars)."""
    toks = [_tokens(c) for c in range(100)]
    for a in range(100):
        for b in range(a + 1, 100):
            shared = toks[a] & toks[b]
            assert not shared, (a, b, sorted(shared)[:3])


def test_alphabets_pairwise_distinct_to_panel_max():
    alphas = [bs._salt_alphabet(c) for c in range(200)]
    assert len(set(alphas)) == 200


@pytest.mark.parametrize("scale,ver", [(1, "salt-v1"), (16, "salt-v1"),
                                       (17, "salt-v1"), (32, "salt-v3"),
                                       (100, "salt-v3")])
def test_stamp_version_preserves_legacy_fixtures(scale, ver):
    """Scales whose copies are all ≤ 16 keep the v1 stamp (cached
    fixtures stay valid); scales that include re-tokenized copies
    bump to v3."""
    want = "salt-v3" if scale > 17 else "salt-v1"
    assert want == ver
