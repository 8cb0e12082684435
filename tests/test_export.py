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


def test_pack_chunks_invariants(spark):
    """Concatenate-and-chunk packing: per stream the token ranges tile
    [0, total) with no gaps or overlaps, chunk ids match the offsets, and
    boundary-spanning is exactly offset_in_chunk + n_tokens > seq_len."""
    from yat_geo_db_spark.pipelines.curation import pack_chunks

    docs = load_table(spark, SF, "documents")
    seq_len = 128
    out = pack_chunks(docs, seq_len=seq_len, n_streams=8).collect()
    assert len(out) == docs.count()
    by_stream: dict = {}
    for r in out:
        by_stream.setdefault(r["stream"], []).append(r)
    assert len(by_stream) == 8
    for rows in by_stream.values():
        rows.sort(key=lambda r: r["start_offset"])
        expect = 0
        for r in rows:
            assert r["start_offset"] == expect          # gapless tiling
            expect = r["start_offset"] + r["n_tokens"]
            assert r["chunk_first"] == r["start_offset"] // seq_len
            assert r["chunk_last"] == (expect - 1) // seq_len
            assert r["offset_in_chunk"] == r["start_offset"] % seq_len
            spans = r["offset_in_chunk"] + r["n_tokens"] > seq_len
            assert (r["chunk_last"] > r["chunk_first"]) == spans
