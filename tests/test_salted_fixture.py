"""Extreme-panel salt fixture invariants (VERDICT r12 task 6): tokens
must be copy-unique for c ≥ 17 so the cross-copy shared-gram term is
exactly zero over salt tokens — the ~(scale/26³)·N² alphabet-collision
residue no longer pollutes the candidate-estimate linearity telemetry
at 100×. Copies ≤ 16 must stay bit-identical to every prior round's
fixtures (empty suffix, disjoint window alphabets)."""

from __future__ import annotations

import pytest

import bench_scaling as bs


def test_copy_suffix_unique_and_versioned():
    # ≤ 16: no suffix (bit-identical legacy fixtures)
    assert all(bs._copy_suffix(c) == "" for c in range(17))
    # ≥ 17: suffixes injective over any plausible panel scale
    sufs = [bs._copy_suffix(c) for c in range(17, 676)]
    assert len(set(sufs)) == len(sufs)
    assert all(s.startswith("q") and len(s) == 3 for s in sufs)


def test_salt_tokens_copy_unique_at_scale():
    """Reconstruct the token set per copy exactly as _salted_doc_copy
    emits it (z + body + reverse(body) + suffix over positions 1,3,5…)
    and assert ZERO pairwise sharing across 100 copies — including the
    ≥17 cohort where the old scheme leaked ~1/676 per token."""
    def tokens(c, n_positions=60):
        alpha = bs._salt_alphabet(c)
        suf = bs._copy_suffix(c)
        out = set()
        for i in range(1, n_positions, 2):
            body = "".join(alpha[int(d)] for d in f"{i:03d}")
            out.add("z" + body + body[::-1] + suf)
        return out

    toks = [tokens(c) for c in range(100)]
    for a in range(100):
        for b in range(a + 1, 100):
            shared = toks[a] & toks[b]
            assert not shared, (a, b, sorted(shared)[:3])


def test_alphabets_pairwise_distinct_to_panel_max():
    alphas = [bs._salt_alphabet(c) for c in range(200)]
    assert len(set(alphas)) == 200


@pytest.mark.parametrize("scale,ver", [(1, "salt-v1"), (16, "salt-v1"),
                                       (17, "salt-v1"), (32, "salt-v2"),
                                       (100, "salt-v2")])
def test_stamp_version_preserves_legacy_fixtures(scale, ver):
    """Scales whose copies are all ≤ 16 keep the v1 stamp (cached
    fixtures stay valid); scales that include suffixed copies bump."""
    want = "salt-v2" if scale > 17 else "salt-v1"
    assert want == ver
