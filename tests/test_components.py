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
