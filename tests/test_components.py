"""Connected-components duplicate clustering (pipelines.dedup):
golden graphs + the pair/cluster consistency properties the dedup decision
rests on.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from yat_geo_db_spark.pipelines.dedup import (
    connected_components,
    dedup_keep_canonical,
    duplicate_clusters,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id1 long, id2 long")


def test_chain_and_island(spark):
    # chain 1-2-3 (transitive closure needed), island 10-11, and a
    # back-edge 3-1 forming a cycle — all one component rooted at 1
    comp = connected_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 1), (10, 11)])
    )
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_converges(spark):
    # a 12-node path needs multiple propagation rounds; fixpoint must
    # still be the global min at every node
    edges = [(i, i + 1) for i in range(12)]
    comp = connected_components(_pairs(spark, edges))
    assert {r["component"] for r in comp.collect()} == {0}


def test_empty_pairs(spark):
    comp = connected_components(_pairs(spark, []))
    assert comp.count() == 0


def test_clusters_cover_pairs(spark):
    # every pair's endpoints must land in the same cluster
    rows = [(1, 5), (5, 9), (2, 3), (7, 8), (8, 9)]
    pairs = _pairs(spark, rows)
    comp = duplicate_clusters(pairs)
    label = {r["doc_id"]: r["cluster_id"] for r in comp.collect()}
    for a, b in rows:
        assert label[a] == label[b]
    # 1-5-9-8-7 merge through the shared 9; 2-3 stay separate
    assert label[1] == label[7] == 1
    assert label[2] == label[3] == 2


def test_canonical_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(1, 2), (2, 3), (6, 7)])
    kept = dedup_keep_canonical(docs, pairs)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # clusters {1,2,3}→keep 1, {6,7}→keep 6; singletons 0,4,5,8,9 all kept
    assert ids == [0, 1, 4, 5, 6, 8, 9]


# --------------------------------------------------------------------------
# Property checks vs a pure-python union-find model
# --------------------------------------------------------------------------

def _model_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_random_graphs_match_union_find(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    edge = st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda e: e[0] != e[1])

    @given(st.lists(edge, min_size=1, max_size=40))
    @settings(max_examples=12, deadline=None)
    def check(edges):
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                _pairs(spark, [(a, b) for a, b in edges])
            ).collect()
        }
        assert got == _model_components(edges)

    check()


def test_distributed_loop_matches_local_fast_path(spark):
    """The size gate must be invisible to results: forcing the distributed
    label-propagation loop (local_max_edges=0) yields EXACTLY the driver
    union-find's labels on chains (multi-round convergence), cycles, merges
    through shared nodes, and isolated islands."""
    edges = (
        [(i, i + 1) for i in range(12)]      # 13-node chain, deep converge
        + [(30, 31), (31, 32), (32, 30)]     # cycle
        + [(40, 45), (45, 41)]               # merge through shared node
        + [(50, 51)]                         # island
    )
    pairs = _pairs(spark, edges)
    dist = {
        r["node"]: r["component"]
        for r in connected_components(pairs, local_max_edges=0).collect()
    }
    local = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert dist == local == _model_components(edges)


def test_upsert_latest_properties(spark):
    from yat_geo_db_spark.relational.merge import upsert_latest

    base = spark.createDataFrame(
        [(i, float(i), 0) for i in range(20)], "k long, v double, version int"
    )
    ups = spark.createDataFrame(
        [(i, float(i) * 10, 1) for i in range(0, 20, 3)],
        "k long, v double, version int",
    )
    merged = upsert_latest(base, ups, ["k"], "version")
    rows = {r["k"]: (r["v"], r["version"]) for r in merged.collect()}
    assert len(rows) == 20                       # keys never duplicate or vanish
    for k in range(20):
        if k % 3 == 0:
            assert rows[k] == (k * 10.0, 1)      # update won
        else:
            assert rows[k] == (float(k), 0)      # base survives
    # idempotent: re-applying the same change set changes nothing
    again = upsert_latest(merged, ups, ["k"], "version")
    assert {r["k"]: (r["v"], r["version"]) for r in again.collect()} == rows
    # empty change set is a no-op
    noop = upsert_latest(base, ups.filter(F.lit(False)), ["k"], "version")
    assert noop.count() == 20
    # same-version conflict: the update side wins deterministically
    conflict = spark.createDataFrame([(5, 99.0, 0)], "k long, v double, version int")
    won = upsert_latest(base, conflict, ["k"], "version")
    assert {r["v"] for r in won.filter(F.col("k") == 5).collect()} == {99.0}


def test_partial_aggregate_merge_is_exactly_associative(spark):
    """merge_partial_aggregates over ANY split of the rows must equal a
    one-shot partial_aggregate of everything BIT-FOR-BIT (the fixed-point
    sums make double addition associative) — the property that lets a
    rollup table be maintained from per-batch increments without
    rescanning history. Checked over several adversarial splits,
    including batches with disjoint and with empty key sets; merged
    output is re-merged to show the state stays closed under merge."""
    import random

    from yat_geo_db_spark.relational.merge import (
        merge_partial_aggregates, partial_aggregate,
    )

    rng = random.Random(7)
    rows = [
        (i % 17, round(rng.uniform(-100, 100), 2), rng.randint(0, 10**6))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k long, x double, m long")
    kw = dict(key_cols=["k"], sum_cols=["x"], min_cols=["m"],
              max_cols=["m"], scale=2)

    def snap(frame):
        return sorted(
            (r["k"], r["n_rows"], r["sum_x"], r["min_m"], r["max_m"])
            for r in frame.collect()
        )

    want = snap(partial_aggregate(df, **kw))

    splits = [
        [df.filter(F.col("m") % 3 == i) for i in range(3)],     # by value
        [df.filter(F.col("k") < 9), df.filter(F.col("k") >= 9)],  # by key
        [df, df.filter(F.lit(False))],                           # empty batch
    ]
    for parts in splits:
        states = [partial_aggregate(p, **kw) for p in parts]
        merged = merge_partial_aggregates(states, **kw)
        assert snap(merged) == want
        # closure: merging a merged state with an empty state is a no-op
        again = merge_partial_aggregates(
            [merged, partial_aggregate(df.filter(F.lit(False)), **kw)], **kw
        )
        assert snap(again) == want


def test_star_contraction_matches_union_find_random_graphs(spark):
    """deep_graph=True (alternating large-star/small-star) must be
    label-identical to the min-label/union-find semantics on arbitrary
    graphs — property-tested, plus the adversarial case it exists for."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    edge = st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda e: e[0] != e[1])

    @given(st.lists(edge, min_size=1, max_size=40))
    @settings(max_examples=8, deadline=None)
    def check(edges):
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                _pairs(spark, [(a, b) for a, b in edges]),
                local_max_edges=0,
                deep_graph=True,
            ).collect()
        }
        assert got == _model_components(edges)

    check()


def test_star_contraction_deep_chain_beats_propagation_rounds(spark):
    """The raison d'etre: a 60-node path has min-id-propagation depth 59
    (propagation with max_iter=10 must RAISE), while star contraction
    converges within its O(log^2 n) bound and still labels every node
    with the chain minimum."""
    import pytest as _pytest

    edges = [(i, i + 1) for i in range(59)]
    pairs = _pairs(spark, edges)
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=10, local_max_edges=0)
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            pairs, max_iter=10, local_max_edges=0, deep_graph=True
        ).collect()
    }
    assert got == {i: 0 for i in range(60)}


def test_pagerank_matches_numpy_and_conserves_mass(spark):
    """3 iterations on a 5-node graph with a dangling+isolated node equal
    a local NumPy replay exactly; total rank mass stays 1 (the dangling
    correction conserves it)."""
    import numpy as np

    from yat_geo_db_spark.pipelines.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in pagerank(e, nodes, n_iter=3).collect()}

    N, d = 5, 0.85
    r = np.full(N, 1 / N)
    out = {0: [1, 2], 1: [2], 2: [0], 3: [2], 4: []}
    for _ in range(3):
        contrib = np.zeros(N)
        dm = 0.0
        for u, vs in out.items():
            if not vs:
                dm += r[u]
                continue
            for v in vs:
                contrib[v] += r[u] / len(vs)
        r = (1 - d) / N + d * (contrib + dm / N)
    for i in range(N):
        assert abs(got[i] - r[i]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # node universe defaults to src+dst when nodes isn't given
    got2 = pagerank(e, n_iter=1).collect()
    assert {r["node"] for r in got2} == {0, 1, 2, 3}


def test_pagerank_random_graphs_match_numpy(spark):
    """Seeded random digraphs (with dangling nodes, self-loop-free,
    varying density) match the NumPy replay exactly — the engine-
    portability claim on shapes beyond the handcrafted case."""
    import random

    import numpy as np

    from yat_geo_db_spark.pipelines.graph import pagerank

    rng = random.Random(7)
    for trial in range(5):
        n = rng.randint(3, 12)
        edges = sorted(
            {
                (u, v)
                for u in range(n)
                for v in range(n)
                if u != v and rng.random() < 0.3
            }
        )
        n_iter = rng.randint(1, 4)
        nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
        e = spark.createDataFrame(
            edges or [(0, 1)], "src long, dst long"
        )
        if not edges:
            edges = [(0, 1)]
        got = {r["node"]: r["rank"]
               for r in pagerank(e, nodes, n_iter=n_iter).collect()}

        d = 0.85
        out: dict = {u: [] for u in range(n)}
        for u, v in edges:
            out[u].append(v)
        r = np.full(n, 1 / n)
        for _ in range(n_iter):
            contrib = np.zeros(n)
            dm = 0.0
            for u in range(n):
                if not out[u]:
                    dm += r[u]
                    continue
                for v in out[u]:
                    contrib[v] += r[u] / len(out[u])
            r = (1 - d) / n + d * (contrib + dm / n)
        assert all(abs(got[i] - r[i]) < 1e-9 for i in range(n)), (
            f"trial {trial}: n={n} iter={n_iter}"
        )
        assert abs(sum(got.values()) - 1.0) < 1e-9


def test_triangle_counts_match_brute_force(spark):
    """Degree-oriented wedge counting must equal brute-force per-node
    triangle counts on arbitrary graphs — random graphs plus the shapes
    the orientation exists for (a hub/star: many wedges, no triangles;
    K5: every node in C(4,2)=6)."""
    import itertools
    import random

    from yat_geo_db_spark.pipelines.graph import triangle_counts

    def brute(edge_list):
        und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
        nodes = {v for e in und for v in e}
        nbr = {v: set() for v in nodes}
        for a, b in und:
            nbr[a].add(b)
            nbr[b].add(a)
        out = {}
        for trio in itertools.combinations(sorted(nodes), 3):
            x, y, z = trio
            if y in nbr[x] and z in nbr[x] and z in nbr[y]:
                for v in trio:
                    out[v] = out.get(v, 0) + 1
        return out

    rng = random.Random(11)
    cases = [
        [(0, i) for i in range(1, 12)],                     # star: 0 triangles
        [(i, j) for i in range(5) for j in range(5) if i < j],  # K5
    ]
    for _ in range(4):
        n = rng.randint(6, 18)
        cases.append([
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(5, 3 * n))
        ])
    for edge_list in cases:
        df = spark.createDataFrame(edge_list, "src long, dst long")
        got = {r["node"]: r["n_tri"] for r in triangle_counts(df).collect()}
        assert got == brute(edge_list)


def test_personalized_pagerank_seed_locality(spark):
    """PPR invariants: mass conserves to ~1 through teleport AND
    dangling re-injection; a component disconnected from the seed set
    gets EXACTLY zero rank (its nodes have p=0 and no in-paths); and
    the seed itself outranks every non-seed in a symmetric ring where
    uniform PageRank would be flat."""
    from yat_geo_db_spark.pipelines.graph import pagerank, personalized_pagerank

    # component A: ring 0-4; component B: ring 10-12 (disconnected)
    ring_a = [(i, (i + 1) % 5) for i in range(5)]
    ring_b = [(10 + i, 10 + (i + 1) % 3) for i in range(3)]
    edges = spark.createDataFrame(ring_a + ring_b, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")

    ppr = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds, n_iter=25).collect()
    }
    assert abs(sum(ppr.values()) - 1.0) < 1e-6
    assert all(ppr[n] == 0.0 for n in (10, 11, 12)), ppr
    # converged: rank decays geometrically with ring distance from the
    # seed (early iterations instead show the rank pulse mid-transit)
    assert ppr[0] > ppr[1] > ppr[2] > ppr[3] > ppr[4] > 0.0

    # uniform PageRank on the same graph is flat within each ring —
    # the seed preference is purely the teleport's doing
    flat = {
        r["node"]: round(r["rank"], 9)
        for r in pagerank(edges, n_iter=4).collect()
    }
    assert len({flat[n] for n in range(5)}) == 1


def test_personalized_pagerank_unknown_seed_keeps_mass(spark):
    """A seed id absent from the node universe must NOT dilute the
    teleport: |S| counts only in-universe seeds, so Σrank stays ~1 and
    the scores are identical to running without the phantom seed.
    (Regression for the leak where _ns counted ALL distinct seeds but
    p(v) was only assigned to matched ones — Σp < 1, every iteration's
    teleport + dangling re-injection under-distributed.)"""
    from yat_geo_db_spark.pipelines.graph import personalized_pagerank

    ring = [(i, (i + 1) % 5) for i in range(5)]
    edges = spark.createDataFrame(ring, "src long, dst long")
    seeds_ok = spark.createDataFrame([(0,)], "node long")
    seeds_phantom = spark.createDataFrame([(0,), (999,)], "node long")

    base = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds_ok, n_iter=10).collect()
    }
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            edges, seeds_phantom, n_iter=10
        ).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got == base
    assert 999 not in got


def test_k_core_peels_to_fixpoint(spark):
    """k_core must equal the classic peel on known shapes: pendant
    chains cascade away (multi-round), cliques survive with their full
    degree, and a k above the graph's degeneracy leaves nothing."""
    from yat_geo_db_spark.pipelines.graph import k_core

    # K4 with a 3-link pendant chain off node 3 (peels over 3 rounds)
    k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
    chain = [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(k4 + chain, "src long, dst long")

    core2 = {r["node"]: r["deg"] for r in k_core(df, k=2).collect()}
    assert core2 == {0: 3, 1: 3, 2: 3, 3: 3}
    core3 = {r["node"]: r["deg"] for r in k_core(df, k=3).collect()}
    assert core3 == {0: 3, 1: 3, 2: 3, 3: 3}
    assert k_core(df, k=4).count() == 0          # above the degeneracy

    # two cliques joined by one bridge edge: both survive, bridge
    # endpoints keep their clique degree + the bridge never rescues
    # a low-degree node
    k3b = [(20 + i, 20 + j) for i in range(4) for j in range(4) if i < j]
    bridge = [(0, 20)]
    two = spark.createDataFrame(k4 + k3b + bridge, "src long, dst long")
    got = {r["node"]: r["deg"] for r in k_core(two, k=3).collect()}
    assert set(got) == set(range(4)) | set(range(20, 24))
    assert got[0] == 4 and got[20] == 4          # bridge adds a degree


def test_label_propagation_two_cliques_bridge(spark):
    """Two 4-cliques joined by one bridge edge must settle into two
    communities (each labeled by its min member); the bridge must not
    merge them. A NumPy-free python replay of the same deterministic
    rule must agree exactly."""
    from yat_geo_db_spark.pipelines.graph import label_propagation

    edges = []
    for block, base in ((0, 0), (1, 10)):
        ids = [base + j for j in range(4)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges.append((3, 10))  # bridge
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iter=4).collect()
    }

    # python replay of the synchronous min-label rule
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lbl = {v: v for v in adj}
    for _ in range(4):
        lbl = {
            v: max(
                ((sum(1 for u in adj[v] if lbl[u] == c), -c)
                 for c in {lbl[u] for u in adj[v]}),
            )[1] * -1
            for v in adj
        }
    assert got == lbl
    # the two blocks hold distinct labels
    assert {got[v] for v in range(4)} == {0}
    assert {got[v] for v in range(10, 14)} == {10}


def test_label_propagation_rejects_string_ids(spark):
    import pytest
    from yat_geo_db_spark.pipelines.graph import label_propagation

    df = spark.createDataFrame(
        [("a.com", "b.com")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="NUMERIC node ids"):
        label_propagation(df)
