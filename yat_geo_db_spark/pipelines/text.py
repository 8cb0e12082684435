"""Text analysis over a document corpus — language-ID heuristic, quality
scoring, token counting, fingerprinting. All pure Column expressions (no
Python in the hot path): at 100 TB these run inside whole-stage codegen at
scan speed, one pass, no shuffle.

These generalize the reference's text machinery (clean_entity F6, ngrams F1)
from one query string to a corpus-wide pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

#: tiny per-language marker lexicons for the n-gram/stopword language-ID
#: heuristic (deterministic, oracle-expressible: counts of exact token hits)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

FNV_MOD = 1_000_000_007
FNV_BASE = 31


#: shared mixing-hash constants: a large odd multiplier and a large prime
#: modulus. Reducing the KEY mod P BEFORE multiplying is load-bearing
#: twice over: (a) the product is bounded by (P-1)·C ≈ 2.7e15 < 2^63, so
#: 64-bit ids (xxhash-derived, negative, anything) never overflow — a raw
#: key*C wraps past |key| ≈ 3.5e9 and Spark's sign-preserving % then
#: yields NEGATIVE buckets; (b) residues mod the LARGE prime equidistribute
#: for any key stride, unlike `(key*C) % n` for small n, which is a pure
#: function of key mod n (zero mixing: all-even ids → one of 2 shards).
MIX_PRIME = 1_000_003
MIX_MULT = 2654435761


def mix_hash_col(key: Column) -> Column:
    """Well-mixed non-negative residue of an integer key in [0, MIX_PRIME):
    ``((key pmod P) * C) mod P``. Pure 64-bit arithmetic both Spark and
    DuckDB execute identically; mathematically equal to the old
    ``(key*C) mod P`` wherever that didn't overflow."""
    return (
        F.pmod(key.cast("long"), F.lit(MIX_PRIME)) * F.lit(MIX_MULT)
    ) % F.lit(MIX_PRIME)


def bucket_hash_col(key: Column, n: int) -> Column:
    """Deterministic bucket in [0, n): the mixed residue folded mod n —
    the shard/stream/split primitive (never ``(key*C) % n`` directly;
    see MIX_PRIME notes)."""
    return mix_hash_col(key) % F.lit(n)


def sample_hash_col(key: Column, mod: int = MIX_PRIME) -> Column:
    """Deterministic per-key sampling hash in [0, 1): Knuth multiplicative
    hash of the integer key, pure 64-bit arithmetic both Spark and DuckDB
    execute identically. The reproducible-sampling primitive for corpus
    curation at scale: membership is a pure function of the key, so a
    sample is stable across runs, partitionings, engines, and incremental
    re-ingests (unlike rand()/TABLESAMPLE, which are none of those)."""
    return (
        (F.pmod(key.cast("long"), F.lit(mod)) * F.lit(MIX_MULT)) % F.lit(mod)
    ).cast("double") / F.lit(float(mod))


def stratified_sample(
    documents, rates: dict[str, float], strata_col: str = "lang",
    key_col: str = "doc_id",
):
    """Per-stratum reproducible sampling: keep a row iff its sampling hash
    falls below its stratum's rate (strata absent from `rates` → dropped).
    One broadcast join against the tiny rates dim, no shuffle of the corpus,
    no RNG — the curation pattern for 'x% of each language' at 100 TB."""
    spark = documents.sparkSession
    rates_df = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(rates.items())],
        f"{strata_col} string, rate double",
    )
    return (
        documents.join(F.broadcast(rates_df), strata_col)
        .filter(sample_hash_col(F.col(key_col)) < F.col("rate"))
        .drop("rate")
    )


def quality_weighted_sample(
    documents, score_col: Column, floor: float = 0.0, ceiling: float = 1.0,
    key_col: str = "doc_id",
):
    """Score-proportional reproducible sampling: keep a row iff its
    deterministic sampling hash falls below its (clamped) per-row score —
    high-quality docs are kept with high probability, low-quality docs
    rarely, and membership stays a pure function of (key, score): stable
    across runs, partitionings, and engines. The standard quality-curriculum
    downsampling step between scoring and export; pure column predicate,
    no shuffle, no RNG."""
    p = F.least(F.greatest(score_col, F.lit(float(floor))), F.lit(float(ceiling)))
    return documents.filter(sample_hash_col(F.col(key_col)) < p)


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(text, " ")


def token_shingles_col(text: Column, w: int = 3) -> Column:
    """w-token shingles ("a b c" strings) — the standard Broder unit for
    corpus near-dup detection: random docs share almost none (J≈0.001 on the
    fixture corpus) while near-dups share most, so MinHash bands stay sparse.
    Char n-grams are the wrong unit here: any two same-language docs share
    ~0.4 of their trigram set."""
    toks = tokens_col(text)
    n = F.size(toks)
    return F.when(n < w, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (w - 1)),
            lambda i: F.array_join(F.slice(toks, i, w), " "),
        )
    )


def token_count_col(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text))


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish sub-word proxy: count of letter-runs and digit-runs (a cheap
    stand-in for tokenizer-length used to budget LLM training samples)."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-z]+|[0-9]+"), 0))


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens of `text` are in the marker set (array built-ins)."""
    toks = tokens_col(text)
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id_col(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-hit counts, ties resolved in
    fixed key order, zero hits → 'und'. Deterministic and SQL-expressible."""
    scores = [(lang, marker_hits(text, m)) for lang, m in LANG_MARKERS.items()]
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # in-order iteration + strict '>' ⇒ ties go to the EARLIEST language in
    # LANG_MARKERS (matches the oracle's greatest()/first-match CASE)
    for lang, s in scores:
        better = s > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, s).otherwise(best_score)
    return best_lang


def quality_features(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals used to filter training corpora:
    lengths, token stats, stopword ratio, char-class ratios, plus a single
    composite `quality_score` in [0,1]."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("double")
    n_alpha = F.length(F.regexp_replace(text, "[^a-z]", "")).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    avg_tok_len = F.round((n_chars - (n_tok - 1)) / n_tok, 6)
    stop_ratio = F.round(n_stop / n_tok, 6)
    # empty text ⇒ n_chars = 0, and the project's Spark 4 sessions run
    # ANSI-default: an unguarded 0/0 ABORTS the job (n_tok is safe —
    # split('') yields [''], size 1)
    alpha_ratio = F.round(
        F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0)), 6
    )
    # composite: reward mid-length docs with diverse tokens and some stopwords
    score = (
        F.least(n_tok / 50.0, F.lit(1.0)) * 0.4
        + F.least(distinct_ratio * 1.25, F.lit(1.0)) * 0.4
        + F.least(n_stop / 5.0, F.lit(1.0)) * 0.2
    )
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        bpe_ish_token_count_col(text).alias("n_subword_tokens"),
        F.length(text).alias("len_chars"),
        avg_tok_len.alias("avg_token_len"),
        F.round(distinct_ratio, 6).alias("distinct_token_ratio"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def tf_idf_top_terms(documents: DataFrame, k: int = 3,
                     text_col: str = "text") -> DataFrame:
    """Top-k terms per document by tf-idf over the whole corpus.

    Plan shape (the scalable one): explode tokens once → three hash
    aggregations (term-freq per doc, doc-length, doc-freq per token) →
    joins keyed on their group keys → window top-k per doc. The corpus
    size N is a broadcast one-row aggregate, never a driver collect.
    tf-idf = (tf/doc_len) · (ln((N+1)/(df+1)) + 1) — smoothed idf.
    """
    tok = documents.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf_cnt"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    dft = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df_t")
    )
    n = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf = (
        F.col("tf_cnt").cast("double") / F.col("doc_len")
    ) * (
        F.log((F.col("n_docs").cast("double") + 1) / (F.col("df_t") + 1)) + 1
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(dft, "token")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "token", F.round(tfidf, 6).alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "token", "tfidf")
    )


def repetition_signals(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition metrics (Rae et al. 2021 §A1.1, adapted to
    token shingles): per doc, the fraction of all n-gram occurrences taken
    by the single most frequent n-gram, for n = 2 and 3. High values flag
    machine-generated / boilerplate-looping text that length or entropy
    alone miss. Shape: explode shingles → (doc, gram) counts → max/sum per
    doc — two hash aggregations per n, map-side combinable, no window.
    Docs too short for an n-gram score 0.0 (nothing repeats)."""
    base = documents.select("doc_id")
    for n, name in ((2, "top_bigram_frac"), (3, "top_trigram_frac")):
        sh = documents.select(
            "doc_id", F.explode(token_shingles_col(F.col(text_col), n)).alias("g")
        )
        per = sh.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        agg = per.groupBy("doc_id").agg(
            F.round(
                F.max("c").cast("double") / F.sum("c").cast("double"), 6
            ).alias(name)
        )
        base = base.join(agg, "doc_id", "left").withColumn(
            name, F.coalesce(F.col(name), F.lit(0.0))
        )
    return base


def fingerprint_col(text: Column) -> Column:
    """Deterministic document fingerprint: left-fold polynomial rolling
    hash over character codes, `acc*31 + code (mod 1e9+7)`. Pure
    expression (sequence → transform → aggregate) — no UDF.

    RANGE CAVEAT: values live in [0, 1e9+7) — a ~2^30 space, chosen for
    engine-portable 64-bit arithmetic (a larger modulus would overflow
    the fold's multiply), NOT a collision-free identity: birthday math
    expects collisions from ~50k docs. Use it as a cheap similarity/
    change signal; exact-duplicate identity uses md5 digests
    (exact_duplicates, corpus_profile)."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(text)),
        lambda i: F.ascii(F.substring(text, i, 1)).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FNV_BASE + c) % FNV_MOD,
    )


def document_fingerprints(documents: DataFrame, text_col: str = "text") -> DataFrame:
    return documents.select(
        "doc_id", fingerprint_col(F.col(text_col)).alias("fingerprint")
    )


def lang_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    return documents.select(
        "doc_id", "lang", lang_id_col(F.col(text_col)).alias("lang_pred")
    )


# --------------------------------------------------------------------------
# Cleaning / normalization (training-corpus preprocessing)
# --------------------------------------------------------------------------

#: RE2-compatible (no backrefs/lookaround) so the DuckDB oracle runs the
#: SAME patterns; Java regex accepts them identically.
URL_RE = r"https?://[^ ]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
ID_RE = r"[0-9]{6,}"


def normalize_ws_col(text: Column) -> Column:
    """Collapse whitespace runs to single spaces and trim — the first step
    of every corpus-cleaning pipeline. Pure regexp_replace (codegen'd)."""
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def redact_col(text: Column) -> Column:
    """Replace URLs, emails, then long digit runs with typed placeholder
    tokens (C4-style PII scrubbing). Order matters: the URL/email patterns
    consume their own digits before the bare-ID pass runs."""
    out = F.regexp_replace(text, URL_RE, "<URL>")
    out = F.regexp_replace(out, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, ID_RE, "<ID>")


def token_entropy(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document unigram (token) entropy — the standard repetition
    signal for corpus filtering (low entropy = templated/spammy text).

    Closed form over grouped counts: H = ln(n) − (Σ c·ln c)/n, so the plan
    is explode → (doc_id, token) count → one per-doc aggregate. No
    per-row HOF over the token array — the explode shape map-side combines
    and scales linearly with corpus size."""
    tok = documents.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    cnt = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("distinct_tokens"),
            F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
            .alias("s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "distinct_tokens",
            F.round(
                F.log(F.col("n_tokens").cast("double"))
                - F.col("s") / F.col("n_tokens"),
                6,
            ).alias("token_entropy"),
        )
    )


def boilerplate_shingle_ratio(
    documents: DataFrame,
    min_docs: int = 3,
    w: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Per-document fraction of word shingles that are corpus-frequent
    (appear in ≥ min_docs distinct docs) — the cross-document boilerplate
    signal (nav bars, license headers, templates) that per-doc quality
    features can't see.

    The denominator (per-doc distinct-shingle count) is a pure projection
    — no shuffle, no join. Only the numerator touches corpus-global state:
    doc-frequency over one exploded shingle table, FILTERED to nd >=
    min_docs BEFORE the join — the build side carries only the
    boilerplate shingles (a small fraction of the vocabulary), so at
    100 TB the probe explode equi-joins a far smaller (often
    broadcastable) table and AQE splits hot shingles. Previous shape
    (join against the unfiltered vocabulary, count both sides of the
    tally from the join) computed the explode twice and shuffled the
    whole vocabulary through the join for no extra information."""
    sh = documents.select(
        "doc_id",
        F.explode(
            F.array_distinct(token_shingles_col(F.col(text_col), w))
        ).alias("sh"),
    )
    # (doc_id, sh) pairs are distinct by construction (array_distinct per
    # doc), so plain count(*) IS the doc-frequency — no distinct machinery
    common = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("sh")
    )
    per = (
        sh.join(common, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    n_shingles = F.size(
        F.array_distinct(token_shingles_col(F.col(text_col), w))
    )
    return (
        documents.select("doc_id", n_shingles.alias("n_shingles"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            F.when(
                F.col("n_shingles") > 0,
                F.round(
                    F.coalesce("n_common", F.lit(0)).cast("double")
                    / F.col("n_shingles"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("boilerplate_ratio"),
        )
    )


# --------------------------------------------------------------------------
# C4-style line filters (Raffel et al. 2020, §2.2 heuristics — public)
# --------------------------------------------------------------------------

#: phrases whose presence disqualifies a line (C4 uses a longer list; the
#: rule shape, not the lexicon, is the operator)
C4_BAD_PHRASES = ("lorem ipsum", "javascript", "cookie policy")
C4_MIN_LINE_TOKENS = 3
C4_TERMINAL_PUNCT = (".", "!", "?", '"')


def _c4_line_ok(line: Column) -> Column:
    """One line passes when it ends in terminal punctuation, has at least
    C4_MIN_LINE_TOKENS whitespace tokens, contains no curly brace (code
    smell) and none of the bad phrases (case-insensitive)."""
    trimmed = F.trim(line)
    lowered = F.lower(trimmed)
    ok = F.size(F.split(trimmed, " ")) >= C4_MIN_LINE_TOKENS
    term = F.lit(False)
    for p in C4_TERMINAL_PUNCT:
        term = term | trimmed.endswith(F.lit(p))
    ok = ok & term & ~trimmed.contains(F.lit("{")) & ~trimmed.contains(F.lit("}"))
    for phrase in C4_BAD_PHRASES:
        ok = ok & ~lowered.contains(F.lit(phrase))
    return ok


def c4_line_filters(
    documents: DataFrame, min_kept_lines: int = 1, text_col: str = "text"
) -> DataFrame:
    """C4's per-line cleaning pass as one declarative projection: split the
    doc on newlines, keep lines passing `_c4_line_ok`, rejoin. Returns
    (doc_id, n_lines, n_kept, clean_text, keep_doc) — `keep_doc` is C4's
    document-level drop (too few surviving lines). Everything is built-in
    array/string expressions: at 100 TB this is a scan-speed map with no
    shuffle, and the filter predicates are exactly mirrorable in SQL."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, _c4_line_ok)
    return documents.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
        (F.size(kept) >= min_kept_lines).alias("keep_doc"),
    )


# --------------------------------------------------------------------------
# Corpus unigram LM surprisal (CCNet-style quality signal — public method)
# --------------------------------------------------------------------------

def unigram_surprisal(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram surprisal −(1/n)·Σ ln p(tokenᵢ) under the
    CORPUS unigram LM p(w) = count(w)/total — the CCNet-flavored "does this
    look like the corpus" quality signal (high = rare-token soup / noise,
    low = common-token boilerplate; the useful middle band is corpus-typical
    prose).

    Plan: one exploded token pass builds the LM (groupBy token — the
    corpus-global state, map-side combinable, vocabulary-bounded); the
    total token count rides a 1-row cross join (broadcast); scoring is the
    same exploded table joined back to the LM on the token (broadcast when
    the vocabulary is small, shuffle equi-join otherwise) and a per-doc
    average. Returns (doc_id, n_tokens, surprisal)."""
    tok = documents.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    lm = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = lm.agg(F.sum("c").alias("total"))
    scored = (
        tok.join(lm, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (F.log(F.col("total").cast("double"))
             - F.log(F.col("c").cast("double"))).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("nll"), 6).alias("surprisal"),
    )


def bigram_lm_surprisal(
    documents: DataFrame, lam: float = 0.75, text_col: str = "text"
) -> DataFrame:
    """Per-document mean surprisal under an INTERPOLATED corpus bigram LM
    (Jelinek-Mercer smoothing, the classic n-gram LM form behind the
    KenLM-style perplexity filters of CCNet / LLaMA data prep):

        p(w2 | w1) = lam * c(w1,w2)/c(w1) + (1 - lam) * c(w2)/N

    Low = predictable corpus-typical prose, high = token soup; vs the
    unigram signal this also catches *shuffled* common tokens (right words,
    wrong order) — the failure mode a bag-of-words score can't see.
    c(w1) is the unigram count (the standard history-marginal
    approximation; the interpolation keeps every probability > 0 so the
    log never sees a zero). Docs with < 2 tokens have no bigram events and
    drop out, exactly as 0-token docs drop from `unigram_surprisal`.

    Plan: tokenize once; the bigram stream is arrays_zip(toks[:-1],
    toks[1:]) exploded — a Generate at scan speed. Two vocabulary-bounded
    aggregations build the LM (map-side combinable groupBys); scoring
    re-joins the stream to the bigram table on (w1,w2) and the unigram
    table on each side (broadcast when the vocab is small — fixture-true —
    shuffle equi-joins otherwise), then one per-doc average. Nothing in
    the pipeline is O(vocab^2): only OBSERVED bigrams are ever
    materialized. Returns (doc_id, n_bigrams, bigram_surprisal)."""
    # tokenize ONCE: the token-array projection feeds both the bigram
    # stream and the unigram LM (two separate aggregation trees would
    # otherwise re-split the text — doubling the most expensive stage)
    toks_tbl = documents.select(
        "doc_id", tokens_col(F.col(text_col)).alias("t")
    ).persist()
    # eager materialization closes the cold-cache race (two consumers
    # racing a lazy persist both recompute); the cache lives for the
    # returned DataFrame's lifetime — callers that loop over corpora
    # should spark.catalog.clearCache() between runs, same contract as
    # the winnowing-pairs fp table below.
    toks_tbl.count()
    big = (
        toks_tbl.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("t"), 1, F.size("t") - 1).alias("w1"),
                    F.slice(F.col("t"), 2, F.size("t") - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    tok = toks_tbl.select("doc_id", F.explode("t").alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    bi = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    total = uni.agg(F.sum("c").alias("total"))
    scored = (
        big.join(bi, ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (
                -F.log(
                    F.lit(lam) * F.col("c12") / F.col("c1")
                    + F.lit(1.0 - lam) * F.col("c2") / F.col("total")
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("bigram_surprisal"),
    )


# --------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al., "Data Selection for LMs via
# Importance Resampling", NeurIPS 2023): hashed n-gram bag-of-words
# likelihood ratio between a target distribution and the raw corpus.
# --------------------------------------------------------------------------

DSIR_BUCKETS = 1024


def dsir_token_buckets(
    documents: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *extra, bucket): one row per token OCCURRENCE with its hash
    bucket — the shared input of both DSIR passes. Tokenizing + hashing
    is the expensive per-row work (interpreted fold per token); the model
    build and the scoring pass both consume THIS table, so persist it
    once per corpus instead of re-scanning and re-hashing per consumer
    (at 100 TB that is one corpus scan, not two)."""
    return documents.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    ).select(
        id_col, *extra_cols,
        (fingerprint_col(F.col("t")) % n_buckets).alias("bucket"),
    )


def dsir_bucket_table(
    target: DataFrame | None,
    raw: DataFrame | None,
    n_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    target_buckets: DataFrame | None = None,
    raw_buckets: DataFrame | None = None,
) -> DataFrame:
    """(bucket, log_ratio): per-hash-bucket log-likelihood ratio
    ln p_target(b) / p_raw(b) with add-one smoothing, over token unigrams
    hashed into `n_buckets` buckets. This is the trained "model" of DSIR —
    a table bounded by n_buckets (1024 rows), NOT the corpus, so it
    broadcasts everywhere and can be persisted and reused across runs.

    Pass `target_buckets` / `raw_buckets` (from dsir_token_buckets,
    typically one persisted table filtered two ways) to share the
    tokenize+hash pass with the scoring side; the `target`/`raw`
    document-frame arguments are the convenience path that derives them.

    The ratio is quantized to 6 decimals here, once, so downstream per-doc
    sums can run in exact fixed-point (sum of scaled longs — associative,
    partition-order-independent) instead of accumulating raw doubles.

    Both count passes are groupBy(bucket) — map-side combinable,
    shuffling at most n_buckets rows per partition."""
    if target_buckets is None:
        target_buckets = dsir_token_buckets(target, n_buckets, text_col)
    if raw_buckets is None:
        raw_buckets = dsir_token_buckets(raw, n_buckets, text_col)
    t = target_buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    r = raw_buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    # DENSE spine over all n_buckets: buckets unseen in BOTH corpora get
    # their smoothed ratio ln((rt+B)/(tt+B)) like any other bucket — a
    # sparse table would make dsir_importance score novel-token docs
    # with a discontinuous 0.0 fallback instead of the model's own
    # smoothing (the table stays n_buckets rows either way)
    spark = target_buckets.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").cast("long").alias("bucket"))
    joined = (
        spine.join(r, "bucket", "left")
        .join(t, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("tc", F.lit(0)).alias("tc"),
            F.coalesce("rc", F.lit(0)).alias("rc"),
        )
    )
    totals = joined.agg(
        F.sum("tc").alias("tt"), F.sum("rc").alias("rt")
    )
    # ln[(tc+1)/(tt+B)] - ln[(rc+1)/(rt+B)]; every operand is an exact
    # integer below 2^53, so the doubles fed to ln are bit-identical in
    # any engine
    lr = (
        F.log((F.col("tc") + 1).cast("double"))
        - F.log((F.col("tt") + F.lit(n_buckets)).cast("double"))
        - F.log((F.col("rc") + 1).cast("double"))
        + F.log((F.col("rt") + F.lit(n_buckets)).cast("double"))
    )
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket", F.round(lr, 6).alias("log_ratio")
    )


def dsir_importance(
    documents: DataFrame,
    bucket_weights: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_buckets: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, importance): per-document log importance weight
    ln w(x) = Σᵢ ln p_target(bucketᵢ)/p_raw(bucketᵢ) over token
    occurrences — the DSIR score (the paper's weight is the SUM of feature
    log-ratios, not a mean); resample/filter on it (e.g.
    quality_weighted_sample on the exponentiated, length-normalized score)
    to shift the corpus toward the target distribution.

    Pass `token_buckets` (a persisted dsir_token_buckets table — usually
    the same one the model trained from) to skip re-tokenizing.

    Scale shape: one corpus explode, the 1024-row weight table broadcast
    into it, one groupBy(doc). The per-token contributions are the
    6-decimal-quantized ratios scaled to exact longs, so the per-doc sum
    is fixed-point-exact and independent of partitioning — and the output
    double (scaled-sum / 1e6, one correctly-rounded division) is
    bit-identical across engines with NO final rounding step (a rounded
    mean would land exactly on .5e-6 boundaries whenever n_tokens divides
    the quantized sum — the one place engine round() conventions differ)."""
    if token_buckets is None:
        tok = dsir_token_buckets(documents, n_buckets, text_col, id_col)
    else:
        tok = token_buckets.select(id_col, "bucket")
    scored = tok.join(F.broadcast(bucket_weights), "bucket", "left").select(
        id_col,
        F.floor(
            F.coalesce("log_ratio", F.lit(0.0)) * F.lit(1e6) + F.lit(0.5)
        ).cast("long").alias("lr_scaled"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum("lr_scaled").cast("double") / F.lit(1e6)).alias("importance"),
    )


def mixture_resample(
    documents,
    weights: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
):
    """Mixture reweighting with OVERsampling (The Pile's per-source epoch
    factors; DoReMi-style domain weights): a stratum with weight w emits
    every doc ⌊w⌋ times, plus one more copy iff the doc's deterministic
    sampling hash falls below frac(w) — so the stratum's expected output
    mass is exactly w× its input, membership/multiplicity are pure
    functions of (key, w), and no RNG or cross-run instability exists.
    Strata absent from `weights` default to 1.0 (pass 0.0 to drop).

    Output = input columns + `copy_idx` (0-based replica index — distinct
    rows per copy so downstream global shuffle/packing treats replicas as
    independent sequence members).

    Scale shape: the weights dim broadcasts; replication is a per-row
    generator (explode of a ≤⌈w⌉-element sequence) — no shuffle, and the
    blow-up factor is the caller-chosen mixture mass, visible in the plan
    as a Generate node."""
    import math

    spark = documents.sparkSession
    rows = [
        (k, int(math.floor(v)), float(v - math.floor(v)))
        for k, v in sorted(weights.items())
    ]
    wdf = spark.createDataFrame(
        rows, f"{strata_col} string, n_full int, frac double"
    )
    n_copies = (
        F.coalesce(F.col("n_full"), F.lit(1))
        + (
            sample_hash_col(F.col(key_col))
            < F.coalesce(F.col("frac"), F.lit(0.0))
        ).cast("int")
    )
    # sequence(0, n-1) DESCENDS for n=0 (Spark generates [0, -1]) — gate it
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(0), n_copies - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        documents.join(F.broadcast(wdf), strata_col, "left")
        .withColumn("copy_idx", F.explode(copies))
        .drop("n_full", "frac")
    )


def corpus_profile(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus report card — the numbers checked before/after every
    curation stage: doc and token volume, exact-duplicate rate (via md5
    digests — never shuffling text), emptiness, and source/language
    cardinalities. One scan, two aggregates (the distinct-digest count
    rides a groupBy the same scan feeds); every value exact and
    SQL-derivable, so profiles are comparable across engines and runs."""
    text = F.col(text_col)
    # profiling an EMPTY corpus (a filter that matched nothing) is a
    # normal pre/post-curation check — the ratios guard n_docs = 0
    # (ANSI Spark raises DIVIDE_BY_ZERO even for double/count divisions)
    n = F.count(F.lit(1))
    return documents.agg(
        n.alias("n_docs"),
        F.sum(F.size(tokens_col(text))).alias("total_tokens"),
        F.round(
            F.when(
                n > 0, F.sum(F.size(tokens_col(text))).cast("double") / n
            ),
            6,
        ).alias("avg_tokens"),
        F.count(F.when(F.length(text) == 0, 1)).alias("empty_docs"),
        F.countDistinct(F.md5(text)).alias("distinct_texts"),
        F.round(
            F.when(
                n > 0,
                F.lit(1.0) - F.countDistinct(F.md5(text)).cast("double") / n,
            ),
            6,
        ).alias("exact_dup_rate"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )


def source_quality_profile(
    documents: DataFrame,
    min_docs: int = 10,
    min_avg_quality: float = 0.55,
    max_dup_rate: float = 0.05,
    text_col: str = "text",
) -> DataFrame:
    """Per-SOURCE quality report + keep/drop verdict — the domain-level
    filtering stage of RefinedWeb/C4-style pipelines (a source whose docs
    are chronically low-quality or self-duplicating gets dropped
    wholesale, catching generated/mirror sites that per-doc thresholds
    miss one doc at a time). Returns (source, n_docs, n_tokens,
    avg_quality, avg_doc_tokens, dup_rate, keep_source).

    avg_quality aggregates the per-doc composite from `quality_features`
    through an exact fixed-point sum (the per-doc score is already
    6-dp-rounded, so floor(score*1e6 + .5) is lossless) — partition-order
    independent, cross-engine stable. One groupBy on the source key; the
    per-doc feature pass is the same scan. Source counts are naturally
    skewed (one giant crawl domain) but each source reduces to one row of
    partial aggregates map-side, so the shuffle carries sources, not
    docs."""
    q = quality_features(documents, text_col=text_col)
    joined = documents.select(
        "doc_id", "source", F.md5(F.col(text_col)).alias("dg")
    ).join(q.select("doc_id", "n_tokens", "quality_score"), "doc_id")
    qs = F.floor(F.col("quality_score") * 1e6 + F.lit(0.5)).cast("long")
    agg = joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(qs).alias("_qs"),
        F.countDistinct("dg").alias("_distinct"),
    )
    avg_quality = F.round(
        F.col("_qs").cast("double") / 1e6 / F.col("n_docs"), 6
    )
    dup_rate = F.round(
        F.lit(1.0) - F.col("_distinct").cast("double") / F.col("n_docs"), 6
    )
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        avg_quality.alias("avg_quality"),
        F.round(F.col("n_tokens").cast("double") / F.col("n_docs"), 6).alias(
            "avg_doc_tokens"
        ),
        dup_rate.alias("dup_rate"),
        (
            (F.col("n_docs") >= min_docs)
            & (avg_quality >= min_avg_quality)
            & (dup_rate <= max_dup_rate)
        ).alias("keep_source"),
    )


def cap_per_source(
    documents: DataFrame,
    cap: int,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Keep at most `cap` documents per source, highest `quality_score`
    first (ties → lowest doc_id) — RefinedWeb-style domain balancing, so
    one giant crawl domain can't dominate the training mixture.

    Returns (doc_id, source, quality_score, src_rank), src_rank = the
    kept doc's 1-based quality rank inside its source (under-cap
    sources keep all rows, ranked over their full group — their ranks
    are <= cap by construction, so one window + one filter IS the whole
    operator; an earlier hot/cold split added a count, two broadcast
    joins, and a second window for zero pruning, because the output
    contract needs ranks for under-cap sources anyway).

    Skew note: ONLY the (id, source, score) triple rides the rank
    shuffle, never the text, and source cardinality's power law means
    the hottest source's triples sort in one task — that cost is
    inherent to exact per-key ranking with dense ranks; if a use case
    needs only the cap (no ranks), pre-aggregate counts and anti-join
    the under-cap sources around the window."""
    q = quality_features(documents, text_col=text_col).select(
        "doc_id", "quality_score"
    )
    slim = documents.select("doc_id", source_col).join(q, "doc_id")
    w = Window.partitionBy(source_col).orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        slim.withColumn("src_rank", F.row_number().over(w))
        .filter(F.col("src_rank") <= cap)
        .select("doc_id", source_col, "quality_score", "src_rank")
    )


def postings_table(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus inverted index: (token, doc_id, tf). The generalization of
    the reference's fuzzy postings (geo_manager.py:455-460 builds
    trigram→entity postings) from one search table to the whole corpus.
    Built with one explode + one hash aggregation; at scale, write it
    partitioned/bucketed BY TOKEN so a query's term lookups are pruned
    scans and the per-term posting lists arrive co-located."""
    toks = tokens_col(F.col(text_col))
    return (
        documents.select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def keyword_search_scan(
    documents: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boolean AND keyword search as a PURE SCAN: a doc matches iff every
    term occurs; score = total occurrences of all query terms. No
    shuffle, no index — the right form for one-off queries (the whole
    corpus streams through codegen once). Returns (id, score)."""
    if not terms:
        # contract shared with keyword_search_indexed: an empty query
        # matches nothing (the indexed form joins an empty term table)
        return documents.select(
            F.col(id_col), F.lit(0).cast("long").alias("score")
        ).limit(0)
    toks = tokens_col(F.col(text_col))
    terms_arr = F.array(*[F.lit(t) for t in sorted(terms)])
    hits = F.filter(toks, lambda t: F.array_contains(terms_arr, t))
    return (
        documents.select(
            F.col(id_col),
            F.size(hits).cast("long").alias("score"),
            F.size(F.array_distinct(hits)).alias("_nterms"),
        )
        .filter(F.col("_nterms") == len(set(terms)))
        .drop("_nterms")
    )


def keyword_search_indexed(
    postings: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """The same AND query against a prebuilt `postings_table` — the
    serving form when the corpus is static and queries are many: the
    tiny term list broadcasts into the postings scan (with a
    token-partitioned layout the non-matching partitions are pruned
    before any file opens), only the matching postings rows shuffle to
    the per-doc count, and the AND is `count(distinct matched terms) ==
    |terms|`. Row-identical to `keyword_search_scan` (asserted in
    test_text_ops)."""
    uniq = sorted(set(terms))
    spark = postings.sparkSession
    t = F.broadcast(
        spark.createDataFrame([(x,) for x in uniq], "token string")
    )
    return (
        postings.join(t, "token")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("score"),
            F.count(F.lit(1)).alias("_nterms"),
        )
        .filter(F.col("_nterms") == len(uniq))
        .drop("_nterms")
    )


def winnowing_fingerprints(
    documents: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every char k-gram, slide a
    w-hash window, keep each window's minimum. The selected set carries
    the winnowing GUARANTEE: any substring two docs share of length >=
    w + k - 1 chars contributes at least one common fingerprint, while
    only ~2/(w+1) of positions are kept — local, position-robust
    fingerprints for plagiarism-style overlap detection where global
    (whole-doc) fingerprints break on any edit.

    Plan: posexplode k-grams → hash each ONCE → groupBy(id) rebuilds the
    positional hash sequence (the aggregation shuffle is the
    materialization barrier that keeps the per-gram fold out of the
    sliding-window lambdas — the dedup band tables use the same trick); the window mins
    are then array ops over the materialized sequence, O(w) per
    position. Docs shorter than one window keep min(all hashes); docs
    shorter than k get an empty set."""
    from yat_geo_db_spark.pipelines.dedup import char_ngrams, shingle_hash

    g = char_ngrams(F.col(text_col), k)
    hashed = documents.select(
        F.col(id_col), F.posexplode(g).alias("pos", "g")
    ).select(id_col, "pos", shingle_hash(F.col("g")).alias("h"))
    seq = hashed.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "h"))),
            lambda s: s["h"],
        ).alias("hs")
    )
    seq = (
        documents.select(id_col)
        .join(seq, id_col, "left")
        .select(
            id_col,
            F.coalesce("hs", F.array().cast("array<long>")).alias("hs"),
        )
    )
    h = F.col("hs")
    nh = F.size(h)
    # per-window min as least() over w direct lookups — no per-window
    # array materialization (array_min(slice(...)) allocates w elements
    # per position; least() is a flat comparison chain in codegen)
    mins = F.transform(
        F.sequence(F.lit(1), nh - (w - 1)),
        lambda i: F.least(
            *[F.element_at(h, i + F.lit(j)) for j in range(w)]
        ),
    )
    fps = F.array_sort(
        F.array_distinct(
            F.when(nh == 0, F.array().cast("array<long>"))
            .when(nh < w, F.array(F.array_min(h)))
            .otherwise(mins)
        )
    )
    return seq.select(
        id_col, fps.alias("fingerprints"), F.size(fps).alias("n_fp")
    )


def bm25_topk(
    documents: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck Jones; OR semantics): every
    doc containing at least one query term, top-k by
    ``sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` with
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)) — the standard search-engine
    scoring baseline, served from the same explode the inverted index
    builds on.

    Plan — ONE corpus pass total: the token explode feeds a single
    per-doc hash aggregation computing doc length AND one conditional-sum
    tf column per query term (terms are a query parameter, so the
    columns are static); every corpus-level statistic (N, avgdl, each
    term's df) then derives from a one-row aggregate of that narrow
    per-doc table, which broadcasts back. No per-term rows, no second
    scan, one shuffle. Final top-k is TakeOrderedAndProject.

    Cross-engine exactness: idf rounds at 6 dp (ln differs in the last
    ulp across libms); the per-doc term contributions combine as a
    HORIZONTAL left-to-right expression (fixed order — nothing depends
    on partitioning); derived constants like k1+1 are COMPUTED from the
    base literals on both engines, never re-parsed from a decimal
    string."""
    uniq = sorted(set(terms))
    if not uniq:
        return documents.select(
            F.col(id_col), F.lit(0.0).alias("score")
        ).limit(0)
    tok = documents.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    perdoc = tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("token") == F.lit(t)).cast("long")).alias(f"tf_{i}")
            for i, t in enumerate(uniq)
        ],
    )
    stats = perdoc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(uniq))
        ],
    )
    norm = (F.lit(1.0) - F.lit(b)) + F.lit(b) * (
        F.col("dl") / F.col("avgdl")
    )
    score = None
    for i in range(len(uniq)):
        idf = F.round(
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
                / (F.col(f"df_{i}") + F.lit(0.5))
            ),
            6,
        )
        contrib = F.when(
            F.col(f"tf_{i}") > 0,
            idf
            * (
                (F.col(f"tf_{i}") * (F.lit(k1) + F.lit(1.0)))
                / (F.col(f"tf_{i}") + F.lit(k1) * norm)
            ),
        ).otherwise(F.lit(0.0))
        score = contrib if score is None else score + contrib
    any_match = None
    for i in range(len(uniq)):
        cond = F.col(f"tf_{i}") > 0
        any_match = cond if any_match is None else (any_match | cond)
    scored = (
        perdoc.crossJoin(F.broadcast(stats))
        .filter(any_match)
        .select(F.col(id_col), F.round(score, 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def positional_postings(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional inverted index: (token, doc_id, pos) — the phrase-query
    extension of `postings_table`. At scale, store partitioned BY TOKEN
    (like the plain postings): a phrase query then opens only its own
    terms' partitions."""
    toks = tokens_col(F.col(text_col))
    return documents.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "token")
    ).select("token", id_col, "pos")


def phrase_search_scan(
    documents: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase search as a pure scan: occurrences of the consecutive
    token sequence = count of w-token shingles equal to the joined
    phrase (w = len(phrase)). One codegen pass, no shuffle. Returns
    (id, n_occurrences) for matching docs."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    w = len(phrase)
    target = " ".join(phrase)
    sh = token_shingles_col(F.col(text_col), w)
    n = F.size(F.filter(sh, lambda s: s == F.lit(target)))
    return (
        documents.select(F.col(id_col), n.cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )


def phrase_search_indexed(
    postings: DataFrame, phrase: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """The same phrase query against a `positional_postings` index: the
    classic positional-intersection plan — term i's postings shift to
    (doc, pos - i) and the phrase's occurrences are the (doc, pos) keys
    surviving every join. Only the PHRASE TERMS' posting lists ever
    shuffle (keyed on (doc, pos), AQE-splittable); with a
    token-partitioned layout each term list is a pruned scan.
    Row-identical to `phrase_search_scan` (asserted in test_text_ops)."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    cur = None
    for i, t in enumerate(phrase):
        pi = postings.filter(F.col("token") == t).select(
            id_col, (F.col("pos") - F.lit(i)).alias("pos")
        )
        cur = pi if cur is None else cur.join(pi, [id_col, "pos"])
    return cur.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def winnowing_near_dup_pairs(
    documents: DataFrame,
    min_containment: float = 0.7,
    max_df: int = 25,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Local-overlap near-dup pairs from winnowing fingerprints: doc
    pairs whose shared-RARE-fingerprint containment (shared / smaller
    rare set) reaches the threshold — the MOSS/plagiarism pairing,
    which catches a short doc embedded in a long one (every shared
    substring of w+k-1 chars contributes a shared fingerprint) where
    whole-doc Jaccard/SimHash dilute below their thresholds.

    TWO guards make this scale-safe and meaningful, both load-bearing:
    - `max_df`: fingerprints appearing in more than `max_df` docs are
      corpus BOILERPLATE and are excluded from numerator AND
      denominator (the idf idea, and the same rare-first principle as
      the PPJoin prefix filter). Without it the self-join is quadratic
      — measured sum(df²) ≈ 678M candidate rows on the 5,000-doc
      fixture, because a shared-vocabulary corpus concentrates most
      positions onto a few hundred common fingerprints.
    - containment, not absolute count: the ratio separates "quotes a
      passage" from "long doc".

    Plan: explode → broadcast document-frequency filter (df table is
    vocabulary-bounded) → self-equi-join on the rare fingerprint value
    (near-linear: every join key now has df ≤ max_df) → per-pair count.
    Returns (id1, id2, n_shared, containment), id1 < id2; docs whose
    fingerprints are all boilerplate drop out."""
    # the winnowing subtree (hash + positional rebuild + window mins)
    # feeds the df table AND the join sides — persist the small exploded
    # (id, fp) table once, like the dedup band tables
    fps = (
        winnowing_fingerprints(
            documents, k=k, w=w, text_col=text_col, id_col=id_col
        )
        .select(id_col, F.explode("fingerprints").alias("fp"))
        .persist()
    )
    fps.count()
    dfreq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    rare = fps.join(
        F.broadcast(dfreq.filter(F.col("df") <= max_df).select("fp")), "fp"
    )
    sizes = rare.groupBy(id_col).agg(F.count(F.lit(1)).alias("nf"))
    a = rare.select(F.col(id_col).alias("id1"), "fp")
    b = rare.select(F.col(id_col).alias("id2"), "fp")
    pairs = (
        a.join(b, ["fp"])
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id1"), F.col("nf").alias("nf1"))
    sb = sizes.select(F.col(id_col).alias("id2"), F.col("nf").alias("nf2"))
    containment = F.round(
        F.col("n_shared") / F.least(F.col("nf1"), F.col("nf2")), 6
    )
    return (
        pairs.join(sa, "id1")
        .join(sb, "id2")
        .select("id1", "id2", "n_shared", containment.alias("containment"))
        .filter(F.col("containment") >= min_containment)
    )


def temperature_sampling_weights(
    documents: DataFrame,
    alpha: float = 0.3,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights (XLM-R / mT5 α-sampling,
    Conneau et al. 2020 §3.1): per-source sampling share
    qᵢ = pᵢ^α / Σⱼ pⱼ^α over the token-mass shares pᵢ — α < 1 upsamples
    the tail sources and damps the head, the standard fix for a
    head-heavy corpus. `boost = q/p` is the per-source multiplier ready
    to feed `mixture_resample` as its weights dict.

    Determinism across engines: pᵢ is a long-over-long double division;
    the transcendental pow is snapped to fixed-point (floor(x·1e9+0.5))
    BEFORE the normalizing sum, so qᵢ is a ratio of exact longs — the
    only cross-engine float hazard left is pow itself (1-ulp libm skew,
    absorbed by the 6-dp output rounds, same stance as the log-based
    scores). Plan: one corpus scan (count + token-size sum, map-side
    combinable), then source-cardinality arithmetic with two broadcast
    1-row totals. Returns (source, n_docs, n_tokens, p_share, q_share,
    boost)."""
    per = documents.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col(F.col(text_col)))).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("tot_tokens"))
    p = F.col("n_tokens").cast("double") / F.col("tot_tokens").cast("double")
    shared = per.crossJoin(F.broadcast(tot)).withColumn(
        "pow_scaled",
        F.floor(F.pow(p, F.lit(alpha)) * F.lit(1e9) + F.lit(0.5)).cast(
            "long"
        ),
    )
    denom = shared.agg(F.sum("pow_scaled").alias("pow_tot"))
    q = F.col("pow_scaled").cast("double") / F.col("pow_tot").cast("double")
    return (
        shared.crossJoin(F.broadcast(denom))
        .select(
            strata_col,
            "n_docs",
            "n_tokens",
            F.round(p, 6).alias("p_share"),
            F.round(q, 6).alias("q_share"),
            F.round(q / p, 6).alias("boost"),
        )
        .orderBy(strata_col)
    )


def ngram_novelty(
    documents: DataFrame,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document novelty: the fraction of the doc's distinct w-token
    shingles that appear in NO other document — the unique-content ratio
    curation uses to separate original material from recombined
    boilerplate (a doc stitched from corpus-common phrases scores ~0, an
    original one ~1). Complements the intra-doc repetition signals and
    the pairwise winnowing/jaccard measures: this is a corpus-global,
    per-doc scalar.

    Plan: explode the distinct shingles once; ONE shuffle keyed on the
    gram builds the document-frequency table; the join back is on the
    same key (no re-shuffle of the gram stream); one per-doc aggregate.
    Nothing is O(corpus²) — the gram df table is vocabulary-bounded.
    Docs with fewer than w tokens have no shingles: novelty NULL
    (undefined, ANSI-safe), counts 0."""
    grams = documents.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(token_shingles_col(F.col(text_col), w))
        ).alias("g"),
    )
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    per = (
        grams.join(dfreq, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("df") == 1, 1)).alias("n_unique"),
        )
    )
    return (
        documents.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    F.col("n_unique").cast("double")
                    / F.col("n_grams").cast("double"),
                ),
                6,
            ).alias("novelty"),
        )
    )


# --------------------------------------------------------------------------
# PII detection / scrubbing (pre-training privacy pass)
# --------------------------------------------------------------------------

#: RE2-compatible (no backrefs/lookaround; `\b` is the ASCII word boundary
#: in both RE2 and Java) so the DuckDB oracle runs the SAME patterns.
#: Scrub ORDER is part of the contract: each stage counts and replaces on
#: the output of the previous stage, so a credit card's digit groups can
#: never double-count as phone numbers regardless of pattern overlap.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", EMAIL_RE),
    # 16 digits in 4-4-4-4 groups separated by '-' or ' '
    ("card", r"\b[0-9]{4}([- ][0-9]{4}){3}\b"),
    # US SSN shape 3-2-4
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    # dotted quad (no octet-range check — scrubbing favours recall)
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    # optional +CC, optional (area), 3-3-4 with -/./space separators.
    # The \b sits BEFORE the area digits (a leading \b would reject
    # " +1 ..." — space|+ is not a boundary) and after the last digit,
    # so digit runs glued to word chars are refused like card/ssn/ipv4.
    ("phone",
     r"\+?[0-9]{0,2}[-. ]?\(?\b[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b"),
)


def pii_scrub(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Typed PII scrub — the privacy pass every pre-training pipeline runs
    before tokenization (emails, credit cards, SSNs, IPs, phone numbers →
    typed placeholder tokens, per-type hit counts kept for auditing).

    One narrow projection: the five regex stages chain inside a single
    whole-stage-codegen'd select (regexp_count + regexp_replace are JVM
    built-ins), so the pass is a pure map — no shuffle, no Python, reads
    only (id, text). At 100 TB this is scan-bound, which is the floor.

    Returns (id, scrubbed, n_email, n_card, n_ssn, n_ipv4, n_phone, n_pii).
    """
    cur = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, f"<{name.upper()}>")
    inner = documents.select(F.col(id_col), cur.alias("scrubbed"), *counts)
    names = [f"n_{name}" for name, _ in PII_PATTERNS]
    total_col = sum((F.col(n) for n in names[1:]), F.col(names[0]))
    return inner.select(
        id_col, "scrubbed", *names, total_col.alias("n_pii")
    )


def pii_report(
    scrubbed: DataFrame,
    documents: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source PII audit over `pii_scrub` output: document counts, share
    of documents carrying any PII, and total hits per type. The governance
    artifact reviewers ask for ("which sources leak emails?").

    One equi-join on the id (broadcastable when the scrub ran on a slice)
    + one groupBy(source) — all counts map-side combine."""
    names = [f"n_{name}" for name, _ in PII_PATTERNS]
    joined = scrubbed.join(documents.select(id_col, source_col), id_col)
    aggs = [F.sum(n).cast("bigint").alias(f"total_{n[2:]}") for n in names]
    return (
        joined.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("n_pii") > 0, 1)).alias("n_docs_with_pii"),
            *aggs,
        )
        .select(
            source_col,
            "n_docs",
            "n_docs_with_pii",
            F.round(
                F.col("n_docs_with_pii").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("pii_doc_rate"),
            *[f"total_{n[2:]}" for n in names],
        )
    )


def vocab_coverage(
    documents: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary frequency table with rank and cumulative mass
    share — the tokenizer-design curve ("the top-k types cover p% of all
    tokens"). Zipfian corpora saturate fast; the curve's shape is how you
    size a vocabulary before training a tokenizer on 100 TB.

    Plan: explode → groupBy(token) count (map-side combinable, the only
    corpus-scale stage) → ONE global window for rank + running mass. The
    window is single-partition by construction but runs on the COUNTED
    table, which is vocabulary-bounded (Heaps' law: ~1M types at 100 TB),
    not corpus-bounded — the same justified-global-sort shape as
    jaccard_prefix_table's gram ranking. Ties broken (count DESC, token
    ASC) so rank is total and engine-independent.

    Returns (token, cnt, rank, cum_share)."""
    toks = documents.select(
        F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    order = Window.orderBy(F.desc("cnt"), F.asc("token"))
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    everything = Window.partitionBy()
    return counts.select(
        "token",
        "cnt",
        F.row_number().over(order).alias("rank"),
        F.round(
            F.sum("cnt").over(running).cast("double")
            / F.sum("cnt").over(everything).cast("double"),
            6,
        ).alias("cum_share"),
    )


def blocklist_filter(
    documents: DataFrame,
    blockwords: tuple[str, ...],
    max_hits: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style bad-word filter: count tokens that appear in the blocklist
    and flag documents exceeding `max_hits` (C4 itself drops on ANY hit —
    max_hits=0). Returns the audit columns (id, n_blocked, keep) rather
    than silently dropping rows, so the drop rate is reviewable.

    One codegen'd projection, no shuffle. The blocklist rides in the plan
    as a literal array (the real C4 list is ~400 words — fine); a
    dictionary-scale blocklist should instead broadcast-join against the
    exploded token stream like keyword_search_indexed does."""
    hits = marker_hits(F.col(text_col), tuple(blockwords))
    return documents.select(
        F.col(id_col),
        hits.alias("n_blocked"),
        (hits <= max_hits).alias("keep"),
    )


#: uniform-draw modulus for A-ES sampling: ~1e9 (vs the 1e6 MIX_PRIME)
#: so es keys stay distinct on billion-doc pools. (p % P) * MIX_MULT
#: peaks at ~2.7e18 — still inside int64.
ES_SAMPLE_PRIME = 1_000_000_007


def weighted_sample_exact_k(
    documents: DataFrame,
    weight_col: Column,
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row gets es_key = ln(u)/w for a deterministic
    per-key uniform u, and the k largest keys win — inclusion probability
    proportional to weight, membership a pure function of (key, weight).
    The ln(u)/w form is the monotone twin of the textbook u^(1/w) that
    avoids cross-libm pow; the key is rounded at 12 dp (see Resolution
    below — NOT the 6-dp transcendental convention, which would collapse
    large-weight keys onto the tie-break) with id-ascending tie-break.

    Scale shape: a pure projection + global top-k = TakeOrderedAndProject
    (each partition keeps its local k, the driver merges k·partitions
    candidates) — no global sort, no RNG state. Rows with NULL or
    non-positive weight are excluded, per A-ES. Returns (key, weight,
    es_key) of the winners.

    Resolution: the uniform is drawn mod ES_SAMPLE_PRIME (~1e9, not the
    ~1e6 default — keys collide only past a billion docs per pool) and
    the transcendental ln is rounded at 12 dp, fine enough that large
    weights (ln(u)/w spans ~1e-4/w) don't collapse onto the id
    tie-break while still absorbing cross-libm ULP differences."""
    u = F.greatest(
        sample_hash_col(F.col(key_col), ES_SAMPLE_PRIME),
        F.lit(0.5 / ES_SAMPLE_PRIME),
    )
    w = weight_col.cast("double")
    keyed = documents.filter(w.isNotNull() & (w > 0)).select(
        F.col(key_col),
        w.alias("weight"),
        F.round(F.log(u) / w, 12).alias("es_key"),
    )
    return keyed.orderBy(F.desc("es_key"), F.asc(key_col)).limit(k)


def sample_to_token_budget(
    documents: DataFrame,
    budgets: dict[str, int] | DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    weight_col: Column | None = None,
) -> DataFrame:
    """Fill each source's TOKEN budget — the unit pretraining mixes are
    actually specified in (docs-per-source quotas over-serve sources with
    long documents). Docs are taken in a deterministic order — weighted
    A-ES order when `weight_col` is given (quality-weighted mixes), the
    per-key uniform otherwise — and a doc is admitted while the tokens
    taken BEFORE it are under budget, so each group overshoots by at
    most one document (the standard knapsack-free greedy).

    Plan: broadcast budgets dim join (groups absent from `budgets` are
    dropped, mirroring stratified_sample), then ONE row_number-free
    window per group: the running token sum orders by the sampling key —
    group-local sort, no global sort, no RNG. Returns
    (id, group, n_tokens, cum_tokens) of the admitted docs."""
    if isinstance(budgets, DataFrame):
        # declarative form: (group_col, _budget) — lets a pipeline derive
        # budgets (e.g. temperature q_share × total) without a collect
        budgets_df = F.broadcast(
            budgets.select(group_col, F.col("_budget").cast("long"))
        )
    else:
        spark = documents.sparkSession
        budgets_df = F.broadcast(
            spark.createDataFrame(
                [(k, int(v)) for k, v in sorted(budgets.items())],
                f"{group_col} string, _budget long",
            )
        )
    from pyspark.sql import Window

    if weight_col is not None:
        u = F.greatest(
            sample_hash_col(F.col(id_col), ES_SAMPLE_PRIME),
            F.lit(0.5 / ES_SAMPLE_PRIME),
        )
        w = weight_col.cast("double")
        key = F.round(F.log(u) / w, 12)
        order = [F.desc("_key"), F.asc(id_col)]
        # same A-ES domain contract as weighted_sample_exact_k: NULL or
        # non-positive weights are excluded (ln(u)<0, so a negative w
        # would flip the key POSITIVE and outrank every valid doc)
        documents = documents.filter(w.isNotNull() & (w > 0))
    else:
        key = sample_hash_col(F.col(id_col), ES_SAMPLE_PRIME)
        order = [F.asc("_key"), F.asc(id_col)]
    keyed = documents.join(budgets_df, group_col).select(
        F.col(id_col),
        F.col(group_col),
        F.col("_budget"),
        token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
        key.alias("_key"),
    )
    w = Window.partitionBy(group_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = keyed.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.filter(
        F.col("cum_tokens") - F.col("n_tokens") < F.col("_budget")
    ).select(id_col, group_col, "n_tokens", "cum_tokens")


#: HTML-extraction regex chain — RE2∩Java like PII_PATTERNS ((?is) inline
#: flags, lazy quantifiers, no lookaround/backrefs), applied IN ORDER:
#: script/style interiors go FIRST (they routinely contain string
#: literals like '<!--' that would otherwise let the comment pattern
#: swallow visible text up to the next real '-->'), then comments, then
#: the generic tag strip. Counts are taken stage-wise on the
#: already-stripped string, so each count equals the replacements that
#: stage actually performed. Residual regex-scoped blind spot: a stray
#:   '</script>' AFTER a commented-out '<script>' can still over-match
#: — the DOM-free tradeoff, shared with C4/WET-style extractors.
HTML_STRIP_PATTERNS: tuple[tuple[str, str], ...] = (
    ("script", r"(?is)<script[^>]*>.*?</script>"),
    ("style", r"(?is)<style[^>]*>.*?</style>"),
    ("comment", r"(?s)<!--.*?-->"),
    ("tag", r"(?s)<[^>]*>"),
)

#: minimal entity ladder (the ones that survive into body text)
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST — else &amp;lt; would double-decode
)


def html_to_text(
    documents: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """HTML → visible text — the WARC→WET step at the head of every web
    pre-training pipeline: drop comments and script/style blocks, strip
    the remaining markup, decode the common entities, collapse
    whitespace. Counts tags/blocks removed for auditing.

    Deliberately regex-scoped (like C4/WET extraction, not a DOM
    parser): pathological markup degrades to extra whitespace, never to
    an exception. One codegen'd projection — scan-bound like pii_scrub;
    the patterns are RE2∩Java so the DuckDB oracle replays them.

    Returns (id, extracted, n_tags, n_dropped_blocks)."""
    cur = F.col(html_col)
    counts = {}
    for name, pat in HTML_STRIP_PATTERNS:
        # stage-wise count on the CURRENT string = replacements performed
        counts[name] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, " ")
    for ent, repl in HTML_ENTITIES:
        cur = F.replace(cur, F.lit(ent), F.lit(repl))
    return documents.select(
        F.col(id_col),
        normalize_ws_col(cur).alias("extracted"),
        counts["tag"].cast("int").alias("n_tags"),
        (counts["script"] + counts["style"]).cast("int")
        .alias("n_dropped_blocks"),
    )


def pmi_cooccurrence(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    max_df_frac: float = 0.3,
    top_k: int = 50,
) -> DataFrame:
    """Pointwise mutual information over within-document term
    co-occurrence: PMI(a,b) = ln(c_ab·N / (c_a·c_b)) for terms that
    appear together more than independence predicts — the collocation /
    related-phrase signal behind phrase mining and topic seeding.

    Scale shape: one tokenize → distinct (doc, term) pass; a DF filter
    (min_df ≤ df ≤ max_df_frac·N) prunes both hapax noise AND stop
    terms BEFORE the co-occurrence self-join — the stop-term cut is
    what bounds the per-doc pair fan-out (a term in 30% of docs would
    otherwise emit O(N·vocab) pairs). Candidates come from an EQUI
    self-join on doc_id restricted to the filtered vocabulary, counts
    are map-side-combinable, and marginals join back via broadcast
    (vocab-bounded). Final top_k is a TakeOrderedAndProject on
    (pmi desc, a, b). Counts are presence-based (distinct per doc)."""
    terms = (
        documents.select(
            F.col(id_col).alias("_doc"),
            F.explode(
                F.array_distinct(tokens_col(F.col(text_col)))
            ).alias("_t"),
        )
        .where(F.col("_t") != "")
    )
    n_docs_row = documents.select(
        F.count(F.lit(1)).alias("n_docs")
    )
    df_counts = terms.groupBy("_t").agg(F.count(F.lit(1)).alias("df"))
    vocab = (
        df_counts.crossJoin(F.broadcast(n_docs_row))
        .where(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.col("n_docs") * max_df_frac)
        )
        .select("_t", "df")
    )
    kept = terms.join(F.broadcast(vocab), "_t").select("_doc", "_t", "df")
    a = kept.select(
        F.col("_doc"),
        F.col("_t").alias("term_a"),
        F.col("df").alias("c_a"),
    )
    b = kept.select(
        F.col("_doc"),
        F.col("_t").alias("term_b"),
        F.col("df").alias("c_b"),
    )
    pairs = (
        a.join(b, "_doc")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "c_a", "c_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    scored = pairs.crossJoin(F.broadcast(n_docs_row)).select(
        "term_a",
        "term_b",
        "c_ab",
        F.round(
            F.log(
                (F.col("c_ab") * F.col("n_docs")).cast("double")
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ),
            6,
        ).alias("pmi"),
    )
    return scored.orderBy(
        F.desc("pmi"), "term_a", "term_b"
    ).limit(top_k)


def weighted_sample_per_group(
    documents: DataFrame,
    group_cols: list[str],
    weight_col: Column,
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k-PER-GROUP weighted sampling without replacement — the
    grouped sibling of weighted_sample_exact_k (same A-ES es_key =
    ln(u)/w on the deterministic per-key uniform, same 12-dp rounding
    and id tie-break; see that docstring for the resolution math).
    The per-source shape every mixture builder actually needs: "keep
    the best-weighted k docs from EACH source, reproducibly".

    Scale shape: one projection + ONE group-keyed window (rank within
    group by es_key desc) — a sort-based window that spills, never a
    global top-k per group via collect. Groups with fewer than k
    eligible rows keep them all. Returns group cols + (key, weight,
    es_key, rank)."""
    u = F.greatest(
        sample_hash_col(F.col(key_col), ES_SAMPLE_PRIME),
        F.lit(0.5 / ES_SAMPLE_PRIME),
    )
    w = weight_col.cast("double")
    keyed = documents.filter(w.isNotNull() & (w > 0)).select(
        *group_cols,
        F.col(key_col),
        w.alias("weight"),
        F.round(F.log(u) / w, 12).alias("es_key"),
    )
    win = Window.partitionBy(*group_cols).orderBy(
        F.desc("es_key"), F.asc(key_col)
    )
    return keyed.withColumn("rank", F.row_number().over(win)).filter(
        F.col("rank") <= k
    )


def quantile_normalize(
    documents: DataFrame,
    value_col: str,
    key_col: str = "doc_id",
    out_col: str = "pctl",
    n_parts: int = 32,
) -> DataFrame:
    """Rank-based quantile normalization to [0, 1]: pctl =
    (rank − 1)/(n − 1) under the (value, key) total order — the
    scale-free transform that makes heterogeneous quality scores
    mixable (a 0.9 from model A and a 0.9 from model B mean the same
    corpus position afterwards). Ties take distinct adjacent
    percentiles via the id tie-break (keeps the map invertible and the
    oracle exact — NOT percent_rank's shared-rank convention).

    Scale shape: the rank comes from dedup.global_rank (range shuffle +
    partition-local row_number + broadcast offsets — never a
    single-partition window); n arrives as a broadcast 1-row count.
    NULL values are dropped; a 1-row input maps to 0.5."""
    from yat_geo_db_spark.pipelines.dedup import global_rank

    base = documents.select(
        F.col(key_col), F.col(value_col)
    ).where(F.col(value_col).isNotNull())
    ranked = global_rank(
        base, [value_col, key_col], rank_col="_rank", n_parts=n_parts
    )
    n_frame = F.broadcast(base.agg(F.count(F.lit(1)).alias("_n")))
    return ranked.crossJoin(n_frame).select(
        key_col,
        value_col,
        F.when(F.col("_n") > 1,
               F.round(
                   (F.col("_rank") - 1).cast("double")
                   / (F.col("_n") - 1).cast("double"),
                   6,
               ))
        .otherwise(F.lit(0.5))
        .alias(out_col),
    )


def zipf_fit(
    documents: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Zipf's-law fit of the token frequency distribution: OLS of
    ln(count) against ln(rank) over the vocabulary table — natural text
    sits near slope −1; a flat slope flags synthetic/templated corpora
    and a cliff flags boilerplate floods. Returns ONE row
    (n_types, slope, intercept, r2) from learn.grouped_ols' closed-form
    sufficient statistics.

    Scale shape: the regression runs over the VOCABULARY-bounded count
    table (Heaps' law), never the corpus; ln values are 6-dp rounded
    before the fixed-point sufficient-statistic sums so the fit is
    engine-exact. Hapax legomena (count < min_count) are excluded — they
    flatten the tail and double the vocab size for zero signal."""
    from yat_geo_db_spark.pipelines.learn import grouped_ols

    vocab = vocab_coverage(documents, text_col=text_col).where(
        F.col("cnt") >= min_count
    )
    pts = vocab.select(
        F.lit(1).alias("_g"),
        F.round(F.log(F.col("rank").cast("double")), 6).alias("ln_rank"),
        F.round(F.log(F.col("cnt").cast("double")), 6).alias("ln_cnt"),
    )
    fitted = grouped_ols(pts, ["_g"], x_col="ln_rank", y_col="ln_cnt", scale=6)
    return fitted.select(
        F.col("n").alias("n_types"), "slope", "intercept", "r2"
    )


def neyman_allocation_sample(
    documents: DataFrame,
    stratum_cols: list[str],
    value_col: str,
    total_n: int,
    key_col: str = "doc_id",
    scale: int = 6,
) -> DataFrame:
    """Variance-optimal stratified sampling (Neyman allocation): split a
    global sample budget across strata proportional to N_h·S_h (stratum
    size × stratum std) — the allocation that minimizes the variance of
    the stratified mean estimate, vs proportional allocation's
    size-only split (which wastes budget on large LOW-variance strata).
    Rows are then drawn per stratum in the deterministic per-key
    uniform-hash order, so membership is a pure function of
    (key, allocation) — replayable, engine-exact.

    Scale shape: one sufficient-statistics aggregate per stratum
    (dsum ⇒ exact variance numerators), broadcast allocations, one
    group-keyed rank window for the draw. Zero-variance strata get
    weight 0 and draw nothing (the pure Neyman formula: a constant
    stratum contributes no variance); allocations round with
    floor(x+0.5), so the realized total can drift from total_n by at
    most one per stratum. Returns (stratum cols, key, rank, n_alloc)."""
    from yat_geo_db_spark.relational.queries import dsum

    x = F.col(value_col).cast("double")
    stats = documents.groupBy(*stratum_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        dsum(x, scale).alias("_s"),
        dsum(x * x, scale).alias("_ss"),
    )
    # N_h * S_h = sqrt(N_h/(N_h-1)) * sqrt(N_h*ss - s^2)... keep the
    # engine-exact core: w_h = sqrt(max(n*ss - s*s, 0)) equals
    # N_h * S_h * sqrt(N_h-1)/1 up to a per-stratum factor — use the
    # TEXTBOOK population-sd form instead: S_h = sqrt((n*ss - s*s))/n,
    # so N_h*S_h = sqrt(n*ss - s*s) exactly (population sd, ddof=0)
    w = F.sqrt(
        F.greatest(
            F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s"),
            F.lit(0.0),
        )
    )
    weighted = stats.select(*stratum_cols, F.col("_n"), w.alias("_w"))
    totals = F.broadcast(
        weighted.agg(F.sum(F.floor(F.col("_w") * 1e6 + F.lit(0.5)).cast("long")).alias("_tw_fp"))
    )
    alloc = weighted.crossJoin(totals).select(
        *stratum_cols,
        F.least(
            F.floor(
                F.lit(float(total_n))
                * F.floor(F.col("_w") * 1e6 + F.lit(0.5)).cast("double")
                / F.col("_tw_fp").cast("double")
                + F.lit(0.5)
            ).cast("long"),
            F.col("_n"),
        ).alias("n_alloc"),
    )
    win = Window.partitionBy(*stratum_cols).orderBy(
        sample_hash_col(F.col(key_col)), F.col(key_col)
    )
    ranked = documents.join(F.broadcast(alloc), stratum_cols).select(
        *stratum_cols,
        F.col(key_col),
        F.row_number().over(win).alias("rank"),
        "n_alloc",
    )
    return ranked.where(F.col("rank") <= F.col("n_alloc"))


def source_vocab_overlap(
    documents: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary Jaccard between SOURCES — the redundancy map
    of a mixture ("are these two crawls the same corpus wearing
    different names?"); near-1 pairs are merge candidates, near-0 pairs
    add diversity. One distinct (source, token) pass, then an equi
    self-join on TOKEN (per-token fan-out bounded by the source count,
    never doc-scale), plus broadcast per-source vocabulary sizes.
    Output (source_a, source_b, n_common, jaccard) for a < b."""
    st = (
        documents.select(
            F.col(source_col).alias("_s"),
            F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias(
                "_t"
            ),
        )
        .where(F.col("_t") != "")
        .distinct()
    )
    sizes = st.groupBy("_s").agg(F.count(F.lit(1)).alias("_sz"))
    a = st.select(F.col("_s").alias("source_a"), "_t")
    b = st.select(F.col("_s").alias("source_b"), "_t")
    common = (
        a.join(b, "_t")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.select(F.col("_s").alias("source_a"),
                                     F.col("_sz").alias("_za"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("_s").alias("source_b"),
                                     F.col("_sz").alias("_zb"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("_za") + F.col("_zb") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


def term_burstiness(
    documents: DataFrame,
    text_col: str = "text",
    min_total: int = 10,
    top_k: int = 50,
) -> DataFrame:
    """Term burstiness (Church & Gale): variance-to-mean ratio of a
    term's per-document count, zeros included — function words spread
    evenly (VMR ≈ 1, Poisson-like) while topical terms BURST (VMR ≫ 1:
    absent almost everywhere, dense where they appear). The signal
    behind keyword extraction and stop-word induction that raw
    frequency can't give (the most frequent and the most bursty terms
    are different lists).

    All-integer sufficient statistics: S = Σc and Q = Σc² over docs
    containing the term (zero-count docs contribute nothing to either),
    then mean = S/N, var = Q/N − mean² over ALL N docs — exact longs
    until two final divisions, engine-portable with no fixed-point
    machinery. One (doc, token) count pass + one token aggregate +
    broadcast N; min_total prunes rare-term noise; top_k by (vmr desc,
    token)."""
    tok = documents.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    per_doc = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = per_doc.groupBy("token").agg(
        F.sum("c").alias("_s"),
        F.sum(F.col("c") * F.col("c")).alias("_q"),
        F.count(F.lit(1)).alias("df"),
    ).where(F.col("_s") >= min_total)
    n_frame = F.broadcast(
        documents.agg(F.count(F.lit(1)).alias("_n"))
    )
    mean = F.col("_s").cast("double") / F.col("_n").cast("double")
    ex2 = F.col("_q").cast("double") / F.col("_n").cast("double")
    vmr = (ex2 - mean * mean) / mean
    return (
        stats.crossJoin(n_frame)
        .select(
            "token",
            F.col("_s").alias("total_count"),
            "df",
            F.round(vmr, 6).alias("vmr"),
        )
        .orderBy(F.desc("vmr"), "token")
        .limit(top_k)
    )
