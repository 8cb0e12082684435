"""CorpusManager — one façade over the training-data pipeline surface.

The usability counterpart of :class:`yat_geo_db_spark.manager.GeoManager`:
where GeoManager mirrors the reference's geo API, CorpusManager bundles the
LLM-data-pipeline extensions (quality, dedup, decontamination, retrieval,
sampling, packing, splits) behind one object so a pipeline reads as a
sequence of intent-level calls instead of a dozen module imports. Every
method is a thin delegation to the operator modules — semantics, scale
shapes, and oracles live there; nothing here adds logic beyond wiring.

All methods are LAZY (return DataFrames) except `bpe_train`/`fit_pca`,
which are fits that return driver-side parameters (documented on the
underlying functions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

import pyspark.sql.functions as F


class CorpusManager:
    """Wrap a documents DataFrame (doc_id, text, ... metadata) and expose
    the curation/retrieval surface. Optionally wrap an embeddings
    DataFrame (vec_id, embedding) for the vector ops."""

    def __init__(
        self,
        documents: DataFrame,
        embeddings: DataFrame | None = None,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.documents = documents
        self._embeddings = embeddings
        self.text_col = text_col
        self.id_col = id_col

    @property
    def embeddings(self) -> DataFrame:
        if self._embeddings is None:
            raise RuntimeError("CorpusManager was built without embeddings")
        return self._embeddings

    def _require_default_id(self, op: str) -> None:
        """Some dedup delegates key on the literal 'doc_id' column; fail
        loudly instead of silently pairing on the wrong column when the
        facade was configured with a different id column."""
        if self.id_col != "doc_id":
            raise ValueError(
                f"{op} requires id_col='doc_id' (the dedup operators key "
                f"on that column); got {self.id_col!r} — rename the column "
                "or call the pipelines.dedup functions directly"
            )

    # -- signals ----------------------------------------------------------
    def quality(self) -> DataFrame:
        from yat_geo_db_spark.pipelines.text import quality_features

        return quality_features(self.documents, text_col=self.text_col)

    def lang_id(self) -> DataFrame:
        from yat_geo_db_spark.pipelines.text import lang_id

        return lang_id(self.documents, text_col=self.text_col)

    def profile(self) -> DataFrame:
        from yat_geo_db_spark.pipelines.text import corpus_profile

        return corpus_profile(self.documents, text_col=self.text_col)

    def source_profile(self, **kw) -> DataFrame:
        from yat_geo_db_spark.pipelines.text import source_quality_profile

        return source_quality_profile(
            self.documents, text_col=self.text_col, **kw
        )

    # -- dedup / decontamination -----------------------------------------
    def exact_duplicates(self) -> DataFrame:
        from yat_geo_db_spark.pipelines.dedup import exact_duplicates

        self._require_default_id("exact_duplicates")
        return exact_duplicates(self.documents, text_col=self.text_col)

    def near_dup_pairs(self, threshold: float = 0.5) -> DataFrame:
        from yat_geo_db_spark.pipelines.dedup import minhash_lsh_pairs

        self._require_default_id("near_dup_pairs")
        return minhash_lsh_pairs(
            self.documents, threshold, text_col=self.text_col
        )

    def near_dup_clusters(self, threshold: float = 0.5) -> DataFrame:
        from yat_geo_db_spark.pipelines.dedup import (
            connected_components,
            minhash_lsh_pairs,
        )

        self._require_default_id("near_dup_clusters")
        return connected_components(
            minhash_lsh_pairs(self.documents, threshold, text_col=self.text_col)
        )

    def temperature_weights(self, alpha: float = 0.3) -> DataFrame:
        """Per-source XLM-R/mT5 α-sampling weights (p, q, q/p boost)."""
        from yat_geo_db_spark.pipelines.text import (
            temperature_sampling_weights,
        )

        return temperature_sampling_weights(
            self.documents, alpha=alpha, text_col=self.text_col
        )

    def novelty(self, w: int = 3) -> DataFrame:
        """Per-doc unique-content ratio over w-token shingles."""
        from yat_geo_db_spark.pipelines.text import ngram_novelty

        self._require_default_id("novelty")
        return ngram_novelty(self.documents, w=w, text_col=self.text_col)

    def pii_scrub(self) -> DataFrame:
        """Typed PII scrub (per-type counts + placeholder substitution)."""
        from yat_geo_db_spark.pipelines.text import pii_scrub

        return pii_scrub(
            self.documents, text_col=self.text_col, id_col=self.id_col
        )

    def pii_report(self, source_col: str = "source") -> DataFrame:
        """Per-source PII governance report over the scrub output."""
        from yat_geo_db_spark.pipelines.text import pii_report, pii_scrub

        scrubbed = pii_scrub(
            self.documents, text_col=self.text_col, id_col=self.id_col
        )
        return pii_report(
            scrubbed, self.documents,
            source_col=source_col, id_col=self.id_col,
        )

    def blocklist(
        self, blockwords: tuple[str, ...], max_hits: int = 0
    ) -> DataFrame:
        """C4-style bad-word filter audit (n_blocked, keep per doc)."""
        from yat_geo_db_spark.pipelines.text import blocklist_filter

        return blocklist_filter(
            self.documents, blockwords, max_hits=max_hits,
            text_col=self.text_col, id_col=self.id_col,
        )

    def embedding_health(self, group_col: str = "label"):
        """Per-group centroid norm + cohesion over the wrapped embeddings."""
        from yat_geo_db_spark.pipelines.similarity import group_centroid_stats

        return group_centroid_stats(self.embeddings, group_col=group_col)

    def hard_negatives(
        self, queries: DataFrame, k: int = 10, dup_threshold: float = 0.95
    ) -> DataFrame:
        """Contrastive hard negatives over the wrapped embeddings."""
        from yat_geo_db_spark.pipelines.similarity import hard_negative_mining

        return hard_negative_mining(
            self.embeddings, queries, k=k, dup_threshold=dup_threshold
        )

    def vocab_coverage(self) -> DataFrame:
        """Corpus token frequency/rank/cumulative-mass curve."""
        from yat_geo_db_spark.pipelines.text import vocab_coverage

        return vocab_coverage(self.documents, text_col=self.text_col)

    def split_leakage_audit(
        self, splits: DataFrame | None = None, w: int = 13, **kw
    ) -> DataFrame:
        """Cross-split w-gram contamination audit; derives the split via
        leakage_safe_split when none is given."""
        from yat_geo_db_spark.pipelines.curation import split_leakage_audit

        if splits is None:
            splits = self.leakage_safe_split(**kw)
        return split_leakage_audit(
            self.documents, splits, w=w,
            text_col=self.text_col, id_col=self.id_col,
        )

    def html_extract(self, html_col: str = "html") -> DataFrame:
        """WARC→WET HTML → visible-text extraction."""
        from yat_geo_db_spark.pipelines.text import html_to_text

        return html_to_text(
            self.documents, html_col=html_col, id_col=self.id_col
        )

    def curriculum(self, score_col, n_buckets: int = 4):
        """Percentile-bucketed curriculum order over the corpus."""
        from yat_geo_db_spark.pipelines.curation import curriculum_order

        return curriculum_order(
            self.documents, score_col, n_buckets=n_buckets,
            id_col=self.id_col,
        )

    def sample_to_token_budget(
        self, budgets: dict[str, int], group_col: str = "source",
        weight_col=None,
    ) -> DataFrame:
        """Fill per-group token budgets in deterministic (optionally
        weighted) order — the pretraining-mix construction step."""
        from yat_geo_db_spark.pipelines.text import sample_to_token_budget

        return sample_to_token_budget(
            self.documents, budgets, group_col=group_col,
            text_col=self.text_col, id_col=self.id_col,
            weight_col=weight_col,
        )

    def forget(
        self, requests: DataFrame, pairs: DataFrame | None = None,
        threshold: float = 0.5,
    ) -> DataFrame:
        """Right-to-be-forgotten drop audit: requests cascade to each
        doc's whole near-dup cluster (derives the pair graph when none
        is given)."""
        from yat_geo_db_spark.pipelines.curation import right_to_forget

        if pairs is None:
            pairs = self.near_dup_pairs(threshold)
        return right_to_forget(
            self.documents, requests, pairs, id_col=self.id_col
        )

    def dedup_keep_best(
        self, score_col: str, threshold: float = 0.5
    ) -> DataFrame:
        """Quality-priority dedup: surviving docs after keeping the
        max-`score_col` member per near-dup cluster (min-id ties)."""
        from yat_geo_db_spark.pipelines.dedup import (
            dedup_keep_best,
            minhash_lsh_pairs,
        )

        self._require_default_id("dedup_keep_best")
        return dedup_keep_best(
            self.documents,
            minhash_lsh_pairs(self.documents, threshold, text_col=self.text_col),
            score_col=score_col,
        )

    def dedup_by_url(self, url_col: str = "url") -> DataFrame:
        """URL-keyed first-stage dedup: one (keeper id, canonical url,
        group size) row per canonical URL."""
        from yat_geo_db_spark.pipelines.curation import dedup_by_url

        self._require_default_id("dedup_by_url")
        return dedup_by_url(self.documents, url_col=url_col)

    def decontaminate(self, benchmark: DataFrame, threshold: float = 0.5) -> DataFrame:
        from yat_geo_db_spark.pipelines.dedup import band_table, near_dup_filter

        return near_dup_filter(
            self.documents,
            band_table(benchmark, text_col=self.text_col, id_col=self.id_col),
            threshold,
            text_col=self.text_col,
            id_col=self.id_col,
        )

    def merge_increment(self, batch: DataFrame, threshold: float = 0.5) -> DataFrame:
        from yat_geo_db_spark.pipelines.dedup import incremental_corpus_merge

        return incremental_corpus_merge(
            self.documents, batch, threshold,
            text_col=self.text_col, id_col=self.id_col,
        )

    def passage_overlap_pairs(self, min_containment: float = 0.7) -> DataFrame:
        from yat_geo_db_spark.pipelines.text import winnowing_near_dup_pairs

        return winnowing_near_dup_pairs(
            self.documents, min_containment,
            text_col=self.text_col, id_col=self.id_col,
        )

    # -- retrieval --------------------------------------------------------
    def search(self, terms: list[str]) -> DataFrame:
        from yat_geo_db_spark.pipelines.text import keyword_search_scan

        return keyword_search_scan(
            self.documents, terms, text_col=self.text_col, id_col=self.id_col
        )

    def bm25(self, terms: list[str], k: int = 10) -> DataFrame:
        from yat_geo_db_spark.pipelines.text import bm25_topk

        return bm25_topk(
            self.documents, terms, k=k,
            text_col=self.text_col, id_col=self.id_col,
        )

    def phrase(self, phrase: list[str]) -> DataFrame:
        from yat_geo_db_spark.pipelines.text import phrase_search_scan

        return phrase_search_scan(
            self.documents, phrase,
            text_col=self.text_col, id_col=self.id_col,
        )

    def topk_similar(self, query_id: int, k: int = 10,
                     predicate: Column | None = None) -> DataFrame:
        from yat_geo_db_spark.pipelines.similarity import (
            brute_force_topk,
            filtered_topk,
        )

        if predicate is None:
            return brute_force_topk(self.embeddings, query_id, k=k)
        return filtered_topk(
            self.embeddings, self.documents, predicate, query_id, k=k,
            attr_id_col=self.id_col,
        )

    # -- sampling / balancing / splits -----------------------------------
    def stratified_sample(self, rates: dict[str, float],
                          strata_col: str = "lang") -> DataFrame:
        from yat_geo_db_spark.pipelines.text import stratified_sample

        return stratified_sample(
            self.documents, rates, strata_col=strata_col, key_col=self.id_col
        )

    def cap_per_source(self, cap: int, source_col: str = "source") -> DataFrame:
        from yat_geo_db_spark.pipelines.text import cap_per_source

        return cap_per_source(
            self.documents, cap, text_col=self.text_col, source_col=source_col
        )

    def leakage_safe_split(self, pairs: DataFrame | None = None,
                           threshold: float = 0.5, **kw) -> DataFrame:
        from yat_geo_db_spark.pipelines.curation import leakage_safe_split

        if pairs is None:
            pairs = self.near_dup_pairs(threshold)
        return leakage_safe_split(
            self.documents, pairs, id_col=self.id_col, **kw
        )

    # -- export -----------------------------------------------------------
    def pack(self, seq_len: int = 128) -> DataFrame:
        from yat_geo_db_spark.pipelines.curation import pack_chunks

        return pack_chunks(
            self.documents, seq_len=seq_len,
            text_col=self.text_col, id_col=self.id_col,
        )

    def shards(self, n_shards: int) -> DataFrame:
        from yat_geo_db_spark.pipelines.curation import shard_assignment

        return shard_assignment(self.documents, n_shards, key_col=self.id_col)

    # -- fits (driver-side parameters; training runs on the cluster) -----
    def bpe_train(self, n_merges: int = 8):
        from yat_geo_db_spark.pipelines.tokenize import bpe_train

        return bpe_train(self.documents, n_merges=n_merges,
                         text_col=self.text_col)

    def bpe_encode(self, merges) -> DataFrame:
        from yat_geo_db_spark.pipelines.tokenize import bpe_encode

        return bpe_encode(self.documents, merges,
                          text_col=self.text_col, id_col=self.id_col)

    def fit_pca(self, n_components: int = 4):
        from yat_geo_db_spark.pipelines.similarity import pca_fit

        return pca_fit(self.embeddings, n_components=n_components)

    def project_pca(self, mean, components) -> DataFrame:
        from yat_geo_db_spark.pipelines.similarity import pca_project

        return pca_project(self.embeddings, mean, components)

    def fit_quality_classifier(self, label_col: str,
                               feature_cols: list[str], **kw):
        from yat_geo_db_spark.pipelines.learn import logreg_fit_history

        return logreg_fit_history(self.documents, feature_cols, label_col, **kw)

    # -- round-6 session-3 analytics surface ----------------------------
    def quantile_normalize(self, value_col: str, out_col: str = "pctl") -> DataFrame:
        from yat_geo_db_spark.pipelines.text import quantile_normalize

        return quantile_normalize(
            self.documents, value_col, key_col=self.id_col, out_col=out_col
        )

    def weighted_sample_per_group(
        self, group_cols: list[str], weight_col, k: int
    ) -> DataFrame:
        from yat_geo_db_spark.pipelines.text import weighted_sample_per_group

        return weighted_sample_per_group(
            self.documents, group_cols, weight_col, k, key_col=self.id_col
        )

    def sorted_neighborhood_pairs(self, **kw) -> DataFrame:
        from yat_geo_db_spark.pipelines.dedup import sorted_neighborhood_pairs

        return sorted_neighborhood_pairs(
            self.documents, id_col=self.id_col, text_col=self.text_col, **kw
        )

    def pmi_collocations(self, **kw) -> DataFrame:
        from yat_geo_db_spark.pipelines.text import pmi_cooccurrence

        return pmi_cooccurrence(
            self.documents, id_col=self.id_col, text_col=self.text_col, **kw
        )

    def zipf_fit(self, min_count: int = 2) -> DataFrame:
        from yat_geo_db_spark.pipelines.text import zipf_fit

        return zipf_fit(
            self.documents, text_col=self.text_col, min_count=min_count
        )

    def calibration_curve(
        self, scored: DataFrame, score_col: str, label_col: str,
        n_bins: int = 10,
    ) -> DataFrame:
        from yat_geo_db_spark.pipelines.learn import calibration_curve

        return calibration_curve(scored, score_col, label_col, n_bins)

    def auc(self, scored: DataFrame, score_col: str, label_col: str) -> DataFrame:
        from yat_geo_db_spark.pipelines.learn import auc_score

        return auc_score(scored, score_col, label_col)

    def sq8_topk(self, query_id: int, k: int = 10) -> DataFrame:
        from yat_geo_db_spark.pipelines.similarity import sq8_topk

        return sq8_topk(self.embeddings, query_id, k=k)

    def dim_truncation_eval(self, dims: tuple = (8, 16, 32), k: int = 10) -> DataFrame:
        from yat_geo_db_spark.pipelines.similarity import dim_truncation_eval

        return dim_truncation_eval(self.embeddings, dims=dims, k=k)
