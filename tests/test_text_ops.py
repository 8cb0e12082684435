"""Semantic tests for text-pipeline operators whose oracle parity checks
only cross-engine equality, not direction/meaning."""

import pyspark.sql.functions as F


def test_dsir_importance_prefers_target_like_docs(spark):
    """A doc written in the target's vocabulary must score higher than one
    written in the off-target vocabulary, and the broadcast weight table
    is bounded by the bucket count."""
    from yat_geo_db_spark.pipelines.text import (
        DSIR_BUCKETS,
        dsir_bucket_table,
        dsir_importance,
    )

    tvocab = ["alpha", "beta", "gamma", "delta"]
    ovocab = ["uno", "dos", "tres", "cuatro"]
    rows = []
    for i in range(20):
        rows.append((i, " ".join(tvocab[j % 4] for j in range(i, i + 12)), "t"))
    for i in range(20, 40):
        rows.append((i, " ".join(ovocab[j % 4] for j in range(i, i + 12)), "o"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, kind string")
    target = docs.filter(F.col("kind") == "t")

    weights = dsir_bucket_table(target, docs)
    assert weights.count() <= DSIR_BUCKETS

    imp = {
        r["doc_id"]: r["importance"]
        for r in dsir_importance(docs, weights).collect()
    }
    target_scores = [imp[i] for i in range(20)]
    off_scores = [imp[i] for i in range(20, 40)]
    assert min(target_scores) > max(off_scores)
