"""Streaming sinks — foreachBatch patterns.

Structured Streaming's file sinks are append-only; anything resembling an
upsert/maintenance write goes through ``foreachBatch``, which hands each
micro-batch to arbitrary batch code exactly once per (checkpoint, batch_id).
The pattern that survives retries at scale is IDEMPOTENT-BY-BATCH-ID: write
each micro-batch to its own ``batch_id=N`` partition directory with
overwrite semantics, so a replayed batch replaces its own output instead of
duplicating it. Readers see the target as one partitioned dataset.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def batch_partitioned_parquet_sink(target_dir: str):
    """Return a foreachBatch function writing each micro-batch to
    ``<target>/batch_id=N`` (overwrite → replay-idempotent). Compose with
    any per-batch transformation before `.writeStream.foreachBatch(...)`."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(target_dir, f"batch_id={batch_id}")
        batch_df.write.mode("overwrite").parquet(out)

    return write_batch


def read_sink(spark, target_dir: str) -> DataFrame:
    """Read the sink back as one dataset (partition column = batch_id)."""
    return spark.read.option("basePath", target_dir).parquet(
        os.path.join(target_dir, "batch_id=*")
    )


def decontaminating_sink(corpus_bands: DataFrame, target_dir: str,
                         threshold: float = 0.5, w: int = 3):
    """foreachBatch decontamination: each micro-batch of incoming documents
    is filtered against a STATIC reference-corpus band index
    (dedup.band_table, built once and persisted by the caller) before the
    idempotent batch-partitioned write — the ingest-time shape of benchmark
    decontamination on a streaming feed.

    The anti-join needs batch semantics (stream-stream anti joins with this
    shape aren't expressible), which is exactly what foreachBatch provides:
    the banding of the incoming batch is stateless, the corpus index is a
    constant relation, and replays rewrite their own batch_id partition.
    """
    from yat_geo_db_spark.pipelines.dedup import near_dup_filter

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        survivors = near_dup_filter(
            batch_df, corpus_bands, threshold=threshold, w=w
        )
        out = os.path.join(target_dir, f"batch_id={batch_id}")
        survivors.write.mode("overwrite").parquet(out)

    return write_batch


def exact_decontaminating_sink(benchmark: DataFrame, target_dir: str,
                               w: int = 13):
    """foreachBatch EXACT decontamination: each micro-batch is filtered by
    the GPT-3-style verbatim w-gram test (dedup.exact_ngram_decontaminate)
    against a static benchmark set before the idempotent write — the
    exact-match complement of decontaminating_sink's MinHash filter, for
    the leak mode where one verbatim benchmark sentence hides inside an
    otherwise-dissimilar incoming doc. The benchmark gram index broadcasts
    inside the batch join; pass the benchmark relation persisted."""
    from yat_geo_db_spark.pipelines.dedup import exact_ngram_decontaminate

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        survivors = exact_ngram_decontaminate(batch_df, benchmark, w=w)
        out = os.path.join(target_dir, f"batch_id={batch_id}")
        survivors.write.mode("overwrite").parquet(out)

    return write_batch


def ann_index_append_sink(root: str, kind: str = "ivfpq", m: int = 4,
                          dim: int | None = None, id_col: str = "vec_id",
                          vec_col: str = "embedding"):
    """foreachBatch maintenance of a persisted ANN index: each micro-batch
    of (id, embedding) rows is encode-only appended under the index's
    FROZEN centroids/codebooks (ivfpq_index_append / the k-means IVF
    twin) — the streaming half of a production embedding store: train
    once offline, keep ingesting online.

    Replay safety: foreachBatch is at-least-once, and the codes layout is
    partitionBy(cid) (no batch_id dirs), so the sink passes
    skip_existing=True — a replayed batch anti-joins against the ids
    already in the index and appends nothing. That anti-join only
    protects against ids ALREADY ON DISK, so the sink also dedupes
    within the micro-batch (dropDuplicates on id — an at-least-once
    source can deliver the same id twice in ONE batch, e.g. producer
    retries in a single poll); that one keyed shuffle is the price of
    the 'no duplicate vec_ids in the index' invariant. The anti-join
    scans only the index's id column (column-pruned); for very hot
    streams, dedupe upstream and swap in skip_existing=False. Empty
    micro-batches (a restart, or an upstream filter dropping every row)
    are a no-op rather than a query-killing encode of zero rows."""
    if kind not in ("ivfpq", "kmeans_ivf"):
        raise ValueError(f"unknown index kind {kind!r}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from yat_geo_db_spark.pipelines.similarity import (
            ivfpq_index_append, kmeans_ivf_index_append,
        )

        if batch_df.isEmpty():
            return
        batch_df = batch_df.dropDuplicates([id_col])
        spark = batch_df.sparkSession
        if kind == "ivfpq":
            ivfpq_index_append(spark, root, batch_df, m=m, id_col=id_col,
                               vec_col=vec_col, dim=dim, skip_existing=True)
        else:
            kmeans_ivf_index_append(spark, root, batch_df, id_col=id_col,
                                    vec_col=vec_col, skip_existing=True)

    return write_batch
