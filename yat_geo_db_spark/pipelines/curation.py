"""End-to-end corpus curation — the composed training-data pipeline:

    signals (quality + entropy + boilerplate)  →  threshold filter
    →  near-dup pair graph over the SURVIVORS  →  connected components
    →  keep one doc per cluster  →  curated corpus + per-doc signals

Composes the individually-oracle-checked operators (pipelines.text,
pipelines.dedup) in the canonical order: cheap per-doc signals first (three
hash aggregations, map-side combinable), the expensive pairwise stage only
over the docs that survive filtering — at 100 TB the filter typically
removes a third of the corpus before anything quadratic-ish runs. Dedup is
last because canonical-selection should never resurrect a filtered doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from yat_geo_db_spark.pipelines.dedup import (
    dedup_keep_canonical,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from yat_geo_db_spark.pipelines.text import (
    boilerplate_shingle_ratio,
    quality_features,
    token_entropy,
    token_shingles_col,
)

#: defaults sit inside the fixture corpus's signal distributions so each
#: stage demonstrably drops documents (see COVERAGE.md)
MIN_QUALITY = 0.6
MIN_ENTROPY = 2.6
MAX_BOILERPLATE = 0.5

#: SimHash's short-text boundary (tokens): below this, per-bit majority
#: votes are too noisy for the tight hamming band to catch moderate
#: near-dups (measured on ~54-token docs: near-IDENTICAL pairs land at
#: h ≤ 2 but jaccard .5-.7 pairs spread to h 7-20 — pinned by
#: tests/test_dedup_blocking.py::test_simhash_short_text_regime_split),
#: so short docs are routed to the exact Jaccard path. Above it, votes
#: stabilize and the cheap signature join owns the regime.
SIMHASH_MIN_TOKENS = 128

#: docs with fewer than 2x this many distinct char trigrams join the
#: Jaccard band regardless of token count (degenerate-repetition guard —
#: see near_dup_pairs)
DEGENERATE_GRAM_FLOOR = 32


def near_dup_pairs(
    documents: DataFrame,
    jaccard_threshold: float = 0.5,
    max_hamming: int = 3,
    simhash_min_tokens: int = SIMHASH_MIN_TOKENS,
    block_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """(id1, id2): the near-dup pair graph with the SimHash short-text
    division of labor expressed IN CODE, not as a tuning comment:

    - docs under ``2 × simhash_min_tokens`` tokens → exact n-gram Jaccard
      (prefix-filter join; correct at any length, costlier per doc)
    - docs of ``simhash_min_tokens``+ tokens → SimHash hamming band
      (cheap signature equi-join; reliable only once votes stabilize)

    The bands OVERLAP on [min_tokens, 2·min_tokens): Jaccard ≥ t bounds
    a true pair's DISTINCT-GRAM-set sizes within a factor 1/t, and for
    non-degenerate text token count tracks gram mass, so with t ≥ 0.5
    any short↔long true pair has both ends inside the Jaccard band —
    routing loses no cross-regime pair; duplicates from the overlap
    dedupe once.

    PREMISE + safety net: the formal bound is on gram-set sizes, and
    adversarially repetitive text decouples the two ("x "×300 has 300
    tokens but 2 distinct grams — token-identical gram set to "x "×100,
    J = 1.0, yet the pair would straddle the token bands). Docs whose
    distinct-gram count is under 2·DEGENERATE_GRAM_FLOOR therefore ALSO
    join the Jaccard band (cheap there — tiny gram sets), which closes
    every pair with an end under the floor (its partner's gram count is
    within 1/t = 2×). The residual: pairs where both ends exceed the
    floor yet token counts decouple by >2× — repetition ratios the
    curate_corpus entropy gate removes upstream; when running
    near_dup_pairs standalone on unfiltered data, filter with
    repetition_signals first."""
    from yat_geo_db_spark.pipelines.dedup import char_ngrams
    from yat_geo_db_spark.pipelines.text import token_count_col

    with_tok = documents.withColumn(
        "_ntok", token_count_col(F.col("text"))
    ).withColumn(
        "_ngrams", F.size(F.array_distinct(char_ngrams(F.col("text"), 3)))
    )
    short = with_tok.filter(
        (F.col("_ntok") < 2 * simhash_min_tokens)
        | (F.col("_ngrams") < 2 * DEGENERATE_GRAM_FLOOR)
    ).drop("_ntok", "_ngrams")
    long_docs = with_tok.filter(
        F.col("_ntok") >= simhash_min_tokens
    ).drop("_ntok", "_ngrams")
    pj = ngram_jaccard_pairs(
        short, threshold=jaccard_threshold, block_cols=block_cols
    ).select("id1", "id2")
    ps = simhash_pairs(
        long_docs, max_hamming=max_hamming, block_cols=block_cols
    ).select("id1", "id2")
    return pj.union(ps).dropDuplicates(["id1", "id2"])


def corpus_signals(documents: DataFrame, min_docs: int = 3) -> DataFrame:
    """Per-doc curation signals in one relation: quality_score, token
    entropy, boilerplate ratio. Three independent aggregation pipelines
    joined on doc_id (each is its own shuffle tree; nothing forces them
    into one pass, and Catalyst reuses the shared scan)."""
    q = quality_features(documents).select("doc_id", "quality_score")
    e = token_entropy(documents).select("doc_id", "token_entropy")
    b = boilerplate_shingle_ratio(documents, min_docs=min_docs).select(
        "doc_id", "boilerplate_ratio"
    )
    return q.join(e, "doc_id").join(b, "doc_id")


def curate_corpus(
    documents: DataFrame,
    min_quality: float = MIN_QUALITY,
    min_entropy: float = MIN_ENTROPY,
    max_boilerplate: float = MAX_BOILERPLATE,
    jaccard_threshold: float = 0.5,
    block_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """The curated corpus: docs passing all three signal thresholds, then
    one representative (min doc_id) per near-duplicate cluster among the
    survivors. Returns (doc_id, quality_score, token_entropy,
    boilerplate_ratio) — the signals ride along for downstream sampling.
    The pair graph routes short docs to exact Jaccard and long docs to
    SimHash (near_dup_pairs); on an all-short corpus this is byte-identical
    to the pure Jaccard graph (the DuckDB oracle's form)."""
    signals = corpus_signals(documents)
    kept = (
        documents.join(signals, "doc_id")
        .filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("token_entropy") >= min_entropy)
            & (F.col("boilerplate_ratio") <= max_boilerplate)
        )
    )
    pairs = near_dup_pairs(
        kept, jaccard_threshold=jaccard_threshold, block_cols=block_cols
    )
    return dedup_keep_canonical(kept, pairs).select(
        "doc_id", "quality_score", "token_entropy", "boilerplate_ratio"
    )


def shard_assignment(df: DataFrame, n_shards: int,
                     key_col: str = "doc_id") -> DataFrame:
    """Deterministic shard + within-shard position for training export.

    Shard = mixed multiplicative hash of the key folded mod n_shards
    (bucket_hash_col: reduce-mod-prime-first — overflow-safe for 64-bit
    ids, non-negative, and actually mixing, unlike a raw (key*C) % n,
    which is a pure function of key mod n); position =
    rank of the key within its shard. Downstream loaders get reproducible
    shard membership AND a reproducible read order."""
    from pyspark.sql import Window

    from yat_geo_db_spark.pipelines.text import bucket_hash_col

    shard = bucket_hash_col(F.col(key_col), n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy(key_col)
    return df.withColumn("shard", shard).withColumn(
        "pos", F.row_number().over(w) - 1
    )


def pack_chunks(
    documents: DataFrame,
    seq_len: int = 2048,
    n_streams: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concatenate-and-chunk sequence packing — the standard LM-pretraining
    data-prep step: documents are concatenated in a deterministic order and
    cut into fixed `seq_len`-token chunks; a document may span a chunk
    boundary. Returns per doc:

        (doc_id, stream, n_tokens, start_offset, chunk_first, chunk_last,
         offset_in_chunk)

    where `start_offset` is the document's token offset within its stream's
    concatenation, chunk_first/last the chunk indices it touches, and
    `offset_in_chunk` its position inside chunk_first — everything a loader
    needs to materialize packed sequences without re-tokenizing.

    Scale shape: a single global concatenation order would serialize the
    window into one partition, so documents are first split into
    `n_streams` independent streams by a deterministic multiplicative hash
    of the id (same constant as shard_assignment — stable across runs and
    engines), and the running-offset window runs PER STREAM: n_streams-way
    parallel, one shuffle. Chunk ids are stream-local; (stream, chunk) is
    the global chunk key. Token counts are whitespace tokens (swap in
    bpe_ish_token_count_col for subword budgeting)."""
    from pyspark.sql import Window

    from yat_geo_db_spark.pipelines.text import token_count_col

    from yat_geo_db_spark.pipelines.text import bucket_hash_col

    stream = bucket_hash_col(F.col(id_col), n_streams).cast("int")
    toks = F.greatest(token_count_col(F.col(text_col)), F.lit(1))
    w = (
        Window.partitionBy("stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_off = (
        documents.select(
            F.col(id_col), stream.alias("stream"), toks.alias("n_tokens")
        )
        .withColumn("end_offset", F.sum("n_tokens").over(w))
        .withColumn("start_offset", F.col("end_offset") - F.col("n_tokens"))
    )
    return with_off.select(
        id_col,
        "stream",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / seq_len).cast("long").alias("chunk_first"),
        F.floor((F.col("end_offset") - 1) / seq_len).cast("long").alias("chunk_last"),
        (F.col("start_offset") % seq_len).cast("long").alias("offset_in_chunk"),
    )


def chunk_overlap(
    documents: DataFrame,
    chunk_len: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document sliding-window chunking with overlap — the
    context-window prep step for long-doc pretraining and retrieval
    indexing (the `return_overflowing_tokens` convention): windows of
    `chunk_len` tokens starting every `stride` tokens, so consecutive
    chunks share `chunk_len - stride` tokens and no token span is lost at
    a window boundary (requires 1 <= stride <= chunk_len — a larger
    stride would leave uncovered gaps, contradicting the lossless-tiling
    contract, and is rejected). A doc with n tokens yields
    ceil((n - chunk_len)/stride) + 1 chunks (one short-tail window when
    the grid overshoots; always ≥ 1 so no doc silently vanishes).

    Complements `pack_chunks`: that op packs WHOLE docs into fixed
    sequences (offsets only); this op SPLITS each doc, emitting the chunk
    text itself. Plan: tokenize once, explode a per-row chunk-index
    sequence (a Generate — scan-speed, no shuffle, no window function;
    chunk rows land on their doc's partition so downstream per-chunk ops
    start co-located). Returns
    (doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_text)."""
    from yat_geo_db_spark.pipelines.text import tokens_col

    n = F.size("t")
    n_chunks = F.when(n <= chunk_len, F.lit(1).cast("long")).otherwise(
        F.floor((n - chunk_len + stride - 1) / stride) + 1
    )
    if not 1 <= stride <= chunk_len:
        raise ValueError(
            f"stride must be in [1, chunk_len]; got stride={stride}, "
            f"chunk_len={chunk_len} (stride > chunk_len loses token spans)"
        )
    start = F.col("chunk_id") * stride
    return (
        documents.select(F.col(id_col), tokens_col(F.col(text_col)).alias("t"))
        .select(
            id_col,
            "t",
            n.alias("n"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            id_col,
            F.col("chunk_id"),
            start.cast("long").alias("start_tok"),
            F.least(F.lit(chunk_len), F.col("n") - start)
            .cast("long")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("t"), start + 1, F.lit(chunk_len)), " "
            ).alias("chunk_text"),
        )
    )


def export_shards(df: DataFrame, path: str, n_shards: int,
                  key_col: str = "doc_id") -> None:
    """Write the curated corpus as n_shards reproducible parquet shards:
    partitionBy("shard") with one file per shard directory (repartition on
    the partition column first), rows sorted by key within each file so
    byte-identical re-exports are possible. The sort is per-partition —
    no global sort."""
    (
        shard_assignment(df, n_shards, key_col)
        .repartition("shard")
        .sortWithinPartitions("shard", key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def leakage_safe_split(
    documents: DataFrame,
    pairs: DataFrame,
    val_pct: int = 10,
    test_pct: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/val/test assignment that can't leak near-duplicates across
    splits: the split is a pure hash of the doc's near-dup CLUSTER id (min
    doc id in the connected component; singletons use their own id), so
    every member of a cluster lands in the same split — hashing raw doc ids
    would put a train doc's near-twin in test, the classic eval
    contamination bug.

    One component pass over the pair graph + a left join back to the
    corpus; the split hash is the same multiplicative scheme as
    shard_assignment (stable across runs, partitionings, engines).
    Returns (doc_id, split_key, split)."""
    from yat_geo_db_spark.pipelines.dedup import connected_components

    comp = connected_components(pairs, src="id1", dst="id2").select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )
    keyed = documents.select(id_col).join(comp, id_col, "left").select(
        id_col,
        F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("split_key"),
    )
    from yat_geo_db_spark.pipelines.text import bucket_hash_col

    bucket = bucket_hash_col(F.col("split_key"), 100)
    return keyed.select(
        id_col,
        "split_key",
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def length_bucket_batches(
    documents: DataFrame,
    batch_size: int = 8,
    bucket_width: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batch assignment — the padding-waste killer for
    sequence training: docs are bucketed by token count (fixed-width
    buckets) and batched WITHIN a bucket in deterministic id order, so
    every batch holds similarly-sized sequences and pad-to-longest wastes
    ~bucket_width tokens instead of ~max-corpus-length.

    One window per bucket (partitionBy bucket — parallel across buckets,
    no global sort). Returns (doc_id, n_tokens, bucket, batch_idx,
    pos_in_batch)."""
    from pyspark.sql import Window

    from yat_geo_db_spark.pipelines.text import token_count_col

    sized = documents.select(
        F.col(id_col),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    ).withColumn(
        "bucket", F.floor(F.col("n_tokens") / F.lit(bucket_width)).cast("int")
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    rn = F.row_number().over(w) - 1
    return sized.select(
        id_col,
        "n_tokens",
        "bucket",
        F.floor(rn / F.lit(batch_size)).cast("long").alias("batch_idx"),
        (rn % F.lit(batch_size)).cast("long").alias("pos_in_batch"),
    )


# --------------------------------------------------------------------------
# Dirty-JSONL ingest — the real entry point of a web-scale text pipeline:
# crawler output always contains malformed lines, and a 100 TB job must
# quarantine them, not die (FAILFAST) or silently null them out.
# --------------------------------------------------------------------------

#: explicit document schema for JSONL ingest (schema inference would scan
#: the data twice and lock in whatever the first sample happened to contain)
import pyspark.sql.types as _T

DOCUMENT_JSONL_SCHEMA = _T.StructType(
    [
        _T.StructField("doc_id", _T.LongType()),
        _T.StructField("text", _T.StringType()),
        _T.StructField("lang", _T.StringType()),
        _T.StructField("source", _T.StringType()),
        _T.StructField("_corrupt_record", _T.StringType()),
    ]
)


def read_documents_jsonl(spark, path: str):
    """(clean, quarantine): read newline-delimited JSON documents with an
    explicit schema in PERMISSIVE mode — malformed lines land intact in
    `_corrupt_record` instead of failing the job — and split the result
    into the clean relation (corrupt column dropped) and a quarantine
    relation (the raw offending lines, for repair/audit). Also quarantines
    structurally-valid rows missing the required keys (doc_id/text), which
    PERMISSIVE parses as nulls.

    Scale notes: JSONL splits on line boundaries so the read parallelizes
    per block like any text source; keep the quarantine output — at corpus
    scale its VOLUME is a data-quality metric worth alerting on."""
    raw = spark.read.schema(DOCUMENT_JSONL_SCHEMA).option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", "_corrupt_record").json(path)
    bad = F.col("_corrupt_record").isNotNull() | F.col("doc_id").isNull() | F.col(
        "text"
    ).isNull()
    clean = raw.filter(~bad).drop("_corrupt_record")
    quarantine = raw.filter(bad).select(
        F.coalesce(
            F.col("_corrupt_record"),
            F.to_json(F.struct("doc_id", "text", "lang", "source")),
        ).alias("raw_line")
    )
    return clean, quarantine


# --------------------------------------------------------------------------
# URL-keyed dedup (C4 / RefinedWeb first-stage): canonicalize the crawl
# URL, keep one document per canonical URL. Runs BEFORE any content
# dedup at real scale — it is a pure string-key groupBy, orders of
# magnitude cheaper than shingling, and removes the bulk re-crawl
# duplicates (http/https, www, tracking-query, trailing-slash variants).
# --------------------------------------------------------------------------

def url_canonical_col(url: Column) -> Column:
    """Canonical form of a crawl URL, built from engine-portable regex
    steps (identical semantics in Spark's Java regex and DuckDB's RE2 —
    the oracle runs the same patterns): strip ALL whitespace first
    (literal whitespace is illegal in a URL and, crucially, an embedded
    newline would split the two engines — Java's '.'/'$' stop at '\\n',
    RE2's '$' does not; on newline-free input the remaining anchored
    patterns agree) → lowercase → drop the query string and fragment
    entirely (the RefinedWeb choice; tracking params make per-param
    allowlists churn forever) → strip the scheme → strip one leading
    'www.' → strip one trailing slash."""
    c = F.lower(F.regexp_replace(url, r"\s", ""))
    c = F.regexp_replace(c, r"[?#].*$", "")
    c = F.regexp_replace(c, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    return F.regexp_replace(c, r"/$", "")


def dedup_by_url(
    documents: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One row per surviving document: the min-id doc per canonical URL,
    with the canonical key and its duplicate-group size. Documents with
    NO usable key — NULL url, or one that canonicalizes to the empty
    string ('https://', '/', whitespace) — are NOT dedupable and pass
    through one-per-doc with url_canonical NULL and group size 1:
    folding them into one NULL-key group would silently discard every
    metadata-less document but one.

    Plan: one projection (the canonicalizer is codegen string work, no
    UDF) and ONE shuffle — non-dedupable rows group on their own id via
    a (dedupable, key) composite, so the pass-through costs no second
    scan of the corpus; F.min picks the keeper and the count is
    map-side combinable, the exact-dedup digest shape (dedup.py) with
    the URL as the digest."""
    canon = documents.select(
        F.col(id_col), url_canonical_col(F.col(url_col)).alias("url_canonical")
    )
    dedupable = F.col("url_canonical").isNotNull() & (
        F.col("url_canonical") != F.lit("")
    )
    key = F.when(dedupable, F.col("url_canonical")).otherwise(
        F.col(id_col).cast("string")
    )
    return (
        canon.groupBy(dedupable.alias("dedupable"), key.alias("k"))
        .agg(
            F.min(F.col(id_col)).alias(id_col),
            F.count(F.lit(1)).alias("url_group_size"),
        )
        .select(
            id_col,
            F.when(F.col("dedupable"), F.col("k")).alias("url_canonical"),
            "url_group_size",
        )
    )


def split_leakage_audit(
    documents: DataFrame,
    splits: DataFrame,
    w: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-split contamination audit: for each held-out split, how many
    of its distinct w-token shingles also occur in train (the standard
    exact-13-gram eval-contamination test, turned inward on your own
    train/val/test assignment). Run it after `leakage_safe_split` to
    PROVE the cluster-keyed split worked — residual overlap is corpus
    boilerplate, not near-duplicate leakage.

    Plan: one shingle explode over the corpus (distinct per split), then
    an equi-join on the gram against the train-side gram set and one
    tiny groupBy(split). The gram tables are vocabulary-bounded; nothing
    is O(corpus²). Train grams would broadcast at dictionary scale but
    the join key is an equi-join either way, so AQE picks.

    Returns one row per held-out split:
    (split, n_grams, n_shared, leak_rate)."""
    grams = (
        documents.select(id_col, text_col)
        .join(splits.select(id_col, "split"), id_col)
        .select(
            "split",
            F.explode(
                F.array_distinct(token_shingles_col(F.col(text_col), w))
            ).alias("g"),
        )
        .distinct()
    )
    train = grams.filter(F.col("split") == "train").select("g")
    held = grams.filter(F.col("split") != "train")
    flagged = held.join(
        train.withColumn("in_train", F.lit(1)), "g", "left"
    )
    return (
        flagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("in_train") == 1, 1)).alias("n_shared"),
        )
        .select(
            "split",
            "n_grams",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ).alias("leak_rate"),
        )
    )


#: epoch-shuffle sort-key modulus (~1e9; see epoch_shuffle docstring)
EPOCH_SHUFFLE_PRIME = 1_000_000_007


def epoch_shuffle(
    documents: DataFrame,
    n_epochs: int = 2,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch training order: every document gets, for
    each epoch, a (shard, position) — the shard is epoch-STABLE (data is
    sharded once; what changes per epoch is the order within a shard),
    the position re-permutes every epoch via a mixed hash of (id, epoch).
    This is how you reshuffle 100 TB between epochs without RNG state or
    a global sort: the only wide op is a row_number window per
    (epoch, shard), whose sort is shard-local.

    The sort key is drawn mod EPOCH_SHUFFLE_PRIME (~1e9, deliberately
    NOT the 1e6 MIX_PRIME: with a 1e6-resolution key, corpora past a
    million docs per shard would resolve mostly by the id tie-break and
    repeat the same id-sorted runs every epoch). Residual ties break by
    id ascending, so the order is total and engine-independent. Returns
    (id, epoch, shard, position)."""
    from yat_geo_db_spark.pipelines.text import bucket_hash_col

    from pyspark.sql import Window

    if n_epochs < 1 or n_shards < 1:
        # sequence(0, n_epochs-1) would step BACKWARD for n_epochs=0
        # (the bpe sequence(1,0) lesson) — refuse instead
        raise ValueError("n_epochs and n_shards must be >= 1")

    P = F.lit(EPOCH_SHUFFLE_PRIME)
    mult = F.lit(2654435761)

    def mixp(col):
        return (F.pmod(col.cast("long"), P) * mult) % P

    epochs = documents.select(F.col(id_col)).withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1)))
    )
    keyed = epochs.select(
        id_col,
        "epoch",
        bucket_hash_col(F.col(id_col), n_shards).alias("shard"),
        # re-mix the epoch-stable residue with the epoch: inner residue
        # < ~1e9 so the +epoch*7919 stays far from 64-bit overflow
        mixp(mixp(F.col(id_col)) + F.col("epoch") * F.lit(7919)).alias(
            "_sort_key"
        ),
    )
    w = Window.partitionBy("epoch", "shard").orderBy(
        F.asc("_sort_key"), F.asc(id_col)
    )
    return keyed.select(
        id_col, "epoch", "shard", F.row_number().over(w).alias("position")
    )


def right_to_forget(
    documents: DataFrame,
    requests: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deletion-request propagation (GDPR/right-to-be-forgotten for a
    training corpus): dropping only the requested doc ids would leave
    their near-duplicate copies in the corpus — the data survives its
    own deletion. This cascades each request to the doc's whole near-dup
    CLUSTER (same component pass the leakage-safe split uses).

    Returns the drop AUDIT — (id, cluster, reason) with reason
    'requested' or 'near_dup_of_requested' — rather than silently
    shrinking the corpus; anti-join the corpus against it to materialize
    the retained set. One component pass over the pair graph + one
    equi-join cascade; the request list is broadcast-sized by nature.

    `requests` carries one column named `id_col`; requested ids absent
    from the corpus are ignored (nothing to drop)."""
    from yat_geo_db_spark.pipelines.dedup import connected_components

    comp = connected_components(pairs, src="id1", dst="id2").select(
        F.col("node").alias(id_col), F.col("component").alias("cluster")
    )
    keyed = documents.select(id_col).join(comp, id_col, "left").select(
        id_col, F.coalesce("cluster", F.col(id_col)).alias("cluster")
    )
    req = F.broadcast(
        requests.select(F.col(id_col)).distinct().withColumn("_req", F.lit(1))
    )
    flagged = keyed.join(req, id_col, "left")
    bad_clusters = F.broadcast(
        flagged.filter(F.col("_req") == 1).select("cluster").distinct()
    )
    return (
        flagged.join(bad_clusters, "cluster", "left_semi")
        .select(
            id_col,
            "cluster",
            F.when(F.col("_req") == 1, F.lit("requested"))
            .otherwise(F.lit("near_dup_of_requested"))
            .alias("reason"),
        )
    )


def curriculum_order(
    documents: DataFrame,
    score_col: Column,
    n_buckets: int = 4,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum-learning order: documents bucketed by exact score
    percentile (bucket 0 = lowest quartile ... consumed easy→hard or
    hard→easy by the trainer), with a deterministic pseudo-random
    position inside each bucket.

    Scale shape: the percentile boundaries are ONE aggregation row
    broadcast back (no global sort of the corpus); bucket assignment is
    a per-row comparison chain; positions come from a row_number window
    per (bucket, shard) — NOT per bucket alone, which would funnel a
    corpus quarter into one sort task (the classic low-cardinality
    window trap; see relational.queries.order_value_deciles). The
    trainer consumes (bucket asc, shard, position). Boundaries are
    rounded at 6 dp before comparison so the bucket edge is the same
    literal in both engines.

    Caveats: NULL scores don't enter the percentile (standard aggregate
    semantics) and land in bucket 0 — pre-filter them if "unscored"
    shouldn't mean "easiest". On heavily tied score distributions
    (>1/n_buckets of the corpus sharing one value) adjacent boundaries
    coincide and the comparison chain skips bucket ids: buckets stay
    ORDINAL (lower id = lower score) but not equal-mass, and some may
    be empty. Returns (id, score, bucket, shard, position)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    from yat_geo_db_spark.pipelines.text import (
        bucket_hash_col,
        sample_hash_col,
    )
    from pyspark.sql import Window

    qs = [i / n_buckets for i in range(1, n_buckets)]
    score = score_col.cast("double")
    bounds = F.broadcast(
        documents.agg(
            F.percentile(score, F.array(*[F.lit(q) for q in qs])).alias("_bs")
        )
    )
    bucket = F.lit(0)
    for j in range(len(qs)):
        bucket = bucket + F.when(
            score > F.round(F.col("_bs")[j], 6), 1
        ).otherwise(0)
    keyed = documents.crossJoin(bounds).select(
        F.col(id_col),
        score.alias("score"),
        bucket.cast("int").alias("bucket"),
        bucket_hash_col(F.col(id_col), n_shards).cast("int").alias("shard"),
        sample_hash_col(F.col(id_col), 1_000_000_007).alias("_k"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy(
        F.asc("_k"), F.asc(id_col)
    )
    return keyed.select(
        id_col, "score", "bucket", "shard",
        F.row_number().over(w).alias("position"),
    )
