"""Multimodal plumbing: binary payload columns + typed metadata through
Arrow-batched mapInPandas; the decode itself is a clearly-stubbed fake."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from yat_geo_db_spark.pipelines.multimodal import (
    _fake_decode,
    decode_image_stub,
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from yat_geo_db_spark.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_extract_features_matches_local_decode(spark):
    # deterministic subset: load_table's scan-compensator repartition makes
    # row order arbitrary, so a bare limit() would pick different rows on
    # each evaluation
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 20)
    media = synthesize_media(docs)
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    local = {
        r["doc_id"]: _fake_decode(
            r["text"].encode(), int(r["doc_id"]) % 640 + 16, int(r["doc_id"]) % 480 + 16
        )
        for r in docs.collect()
    }
    assert feats.keys() == local.keys()
    for doc_id, want in local.items():
        got = feats[doc_id]
        assert got["checksum"] == want["checksum"]
        assert got["n_bytes"] == want["n_bytes"]
        assert got["mean_intensity"] == pytest.approx(want["mean_intensity"])


def test_decode_stub_is_honest():
    assert decode_image_stub(b"abc", "image/fake")["n_bytes"] == 3
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\xff\xd8", "image/jpeg")


def test_frame_sample_counts(spark):
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 5)
    media = synthesize_media(docs)
    out = frame_sample_plan(media, every_nth=10)
    per_doc = {r["doc_id"]: r["cnt"] for r in
               out.groupBy("doc_id").count().withColumnRenamed("count", "cnt").collect()}
    for r in docs.collect():
        n_frames = int(len(r["text"].encode()) / 16) + 1
        expected = (n_frames - 1) // 10 + 1
        assert per_doc[r["doc_id"]] == expected


def test_resize_media_rewrites_payload_and_meta(spark):
    from yat_geo_db_spark.pipelines.multimodal import _fake_resize, resize_media

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10)
    media = synthesize_media(docs)
    out = {r["doc_id"]: r for r in resize_media(media, 32, 32).collect()}
    src = {r["doc_id"]: r for r in media.collect()}
    assert out.keys() == src.keys()
    for doc_id, r in out.items():
        s = src[doc_id]
        want = _fake_resize(
            bytes(s["media_bytes"]),
            s["media_meta"]["width"], s["media_meta"]["height"], 32, 32,
        )
        assert bytes(r["media_bytes"]) == want          # deterministic kernel
        assert r["media_meta"]["width"] == 32
        assert r["media_meta"]["height"] == 32
        assert r["media_meta"]["n_bytes"] == len(want)  # meta tracks payload
        assert len(want) <= s["media_meta"]["n_bytes"]  # downsample shrinks


def test_payload_byte_stats_arrow(spark):
    """mapInArrow path: stats must match a driver-side python recompute on
    the same payload bytes (and n_bytes must agree with the engine's own
    octet length)."""
    from yat_geo_db_spark.pipelines.multimodal import (
        payload_byte_stats,
        synthesize_media,
    )
    from yat_geo_db_spark.testdata import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 40)
    media = synthesize_media(docs)
    got = {
        r["doc_id"]: (r["n_bytes"], r["distinct_bytes"], r["max_run"])
        for r in payload_byte_stats(media).collect()
    }
    for row in media.select("doc_id", F.col("media_bytes").alias("payload")).collect():
        b = bytes(row["payload"])
        best = cur = 1 if b else 0
        for i in range(1, len(b)):
            cur = cur + 1 if b[i] == b[i - 1] else 1
            best = max(best, cur)
        assert got[row["doc_id"]] == (len(b), len(set(b)), best)
    n_engine = {
        r["doc_id"]: r["n"]
        for r in media.select(
            "doc_id", F.octet_length("media_bytes").alias("n")
        ).collect()
    }
    assert all(got[d][0] == n for d, n in n_engine.items())
