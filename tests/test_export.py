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


def test_chunk_overlap_reconstructs_documents(spark):
    """The defining property of overlap chunking: dropping each chunk's
    first (chunk_len - stride) overlap tokens (except chunk 0) and
    concatenating in chunk order reproduces the original token stream
    exactly — no token lost or duplicated at window boundaries. Also: the
    window grid is the HF overflow convention (start = i*stride, >= 1
    chunk per doc, short tail kept)."""
    from yat_geo_db_spark.pipelines.curation import chunk_overlap

    docs = load_table(spark, SF, "documents")
    chunk_len, stride = 16, 12
    out = chunk_overlap(docs, chunk_len=chunk_len, stride=stride).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)                    # every doc chunked
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        toks = texts[doc_id].split(" ")
        rebuilt: list = []
        for r in rows:
            ctoks = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert r["start_tok"] == r["chunk_id"] * stride
            assert len(ctoks) == r["n_chunk_tokens"] == min(
                chunk_len, len(toks) - r["start_tok"]
            )
            rebuilt.extend(ctoks if r["chunk_id"] == 0
                           else ctoks[chunk_len - stride:])
        assert rebuilt == toks
        n = len(toks)
        want = 1 if n <= chunk_len else -(-(n - chunk_len) // stride) + 1
        assert len(rows) == want


def test_leakage_safe_split_never_straddles_pairs(spark):
    """The defining property: for EVERY near-dup pair, both docs land in
    the same split — and the assignment is a pure function of the cluster
    key (re-running yields identical splits)."""
    from yat_geo_db_spark.pipelines.curation import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 25), (25, 39)], "id1 long, id2 long"
    )
    out = leakage_safe_split(docs, pairs).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    key = {r["doc_id"]: r["split_key"] for r in out}
    assert len(split) == 40
    for a, b in [(1, 2), (2, 3), (1, 3), (10, 11), (20, 25), (25, 39), (20, 39)]:
        assert split[a] == split[b], (a, b)
        assert key[a] == key[b]
    # singletons key on themselves
    assert key[5] == 5
    # deterministic re-run
    again = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, pairs).collect()
    }
    assert again == split
    # all three splits materialize over a modest id range
    assert {"train", "val", "test"} == set(split.values())


def test_length_bucket_batches_invariants(spark):
    """Every batch is homogeneous in bucket, holds at most batch_size docs,
    positions are dense in id order, and bucket = floor(n_tokens/width)."""
    from yat_geo_db_spark.pipelines.curation import length_bucket_batches

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i % 37))) for i in range(100)],
        "doc_id long, text string",
    )
    rows = length_bucket_batches(docs, batch_size=8, bucket_width=16).collect()
    assert len(rows) == 100
    by_batch: dict = {}
    for r in rows:
        assert r["bucket"] == r["n_tokens"] // 16
        by_batch.setdefault((r["bucket"], r["batch_idx"]), []).append(r)
    for (_, _), members in by_batch.items():
        assert len(members) <= 8
        poss = sorted(m["pos_in_batch"] for m in members)
        assert poss == list(range(len(poss)))          # dense positions
        ids = [m["doc_id"] for m in sorted(members, key=lambda m: m["pos_in_batch"])]
        assert ids == sorted(ids)                      # id-ordered within batch


def test_bucket_hash_sane_on_64bit_and_structured_ids(spark):
    """Review regression: (key*C) % n overflowed past |key| ~ 3.5e9
    (negative shards) and was a pure function of key mod n (all-even ids
    -> one of 2 shards). The mixed bucket hash must stay in range for
    64-bit/negative keys and spread structured id patterns."""
    import pyspark.sql.functions as F

    from yat_geo_db_spark.pipelines.curation import shard_assignment
    from yat_geo_db_spark.pipelines.text import bucket_hash_col

    big = spark.createDataFrame(
        [(2**62 + i,) for i in range(50)]
        + [(-(2**61) + 7 * i,) for i in range(50)],
        "doc_id long",
    )
    out = shard_assignment(big, 8)
    shards = [r["shard"] for r in out.collect()]
    assert all(0 <= s < 8 for s in shards)
    assert len(set(shards)) > 1
    # structured ids: all even, stepping by 100 — must still hit many
    # buckets (the old low-residue form collapsed them onto one)
    even = spark.createDataFrame([(100 * i,) for i in range(200)], "k long")
    buckets = {
        r["b"]
        for r in even.select(bucket_hash_col(F.col("k"), 2).alias("b")).collect()
    }
    assert buckets == {0, 1}
    b10 = {
        r["b"]
        for r in even.select(
            bucket_hash_col(F.col("k"), 10).alias("b")
        ).collect()
    }
    assert len(b10) >= 8


def test_right_to_forget_cascades_to_cluster(spark):
    """Requesting one member of a near-dup cluster drops the whole
    cluster with the right reasons; singletons drop alone; unknown
    request ids are ignored."""
    import pyspark.sql.functions as F

    from yat_geo_db_spark.pipelines.curation import right_to_forget

    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id1 long, id2 long"
    )
    requests = spark.createDataFrame([(1,), (3,), (99,)], "doc_id long")
    out = {r["doc_id"]: r["reason"]
           for r in right_to_forget(docs, requests, pairs).collect()}
    # cluster {0,1,2} dropped via request on 1; singleton 3 requested;
    # cluster {4,5} untouched; 99 not in corpus -> ignored
    assert out == {
        0: "near_dup_of_requested",
        1: "requested",
        2: "near_dup_of_requested",
        3: "requested",
    }
