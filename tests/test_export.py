"""Training-export sharding (pipelines.curation): reproducible shard
membership/order and the one-file-per-shard layout."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F

from yat_geo_db_spark.pipelines.curation import export_shards, shard_assignment
from yat_geo_db_spark.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_shard_assignment_is_stable_and_balanced(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    a = shard_assignment(docs, 8).collect()
    b = shard_assignment(docs, 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))   # run-stable
    sizes = {}
    for r in a:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    assert len(sizes) == 8
    assert max(sizes.values()) < 2.5 * min(sizes.values())  # roughly even
    # pos is a dense 0..n-1 sequence within each shard
    for s, n in sizes.items():
        ps = sorted(r["pos"] for r in a if r["shard"] == s)
        assert ps == list(range(n))


def test_export_shards_layout(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id")
    out = str(tmp_path / "shards")
    export_shards(docs, out, 4)
    for s in range(4):
        files = glob.glob(f"{out}/shard={s}/*.parquet")
        assert len(files) == 1, f"shard {s}: expected one file, got {files}"
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
