"""Mergeable cardinality sketches — KMV (k-minimum-values).

The 100 TB cardinality toolkit: estimate distinct counts, audience
overlap (set resemblance), and union cardinality from KILOBYTE-sized
sketches instead of full-width distinct shuffles. A KMV sketch of a set
S is simply the k smallest distinct hash values of S's members
(Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM 2002; Beyer et al., "On synopses for distinct-value estimation
under multiset operations", SIGMOD 2007). Properties that matter at
scale:

- **Mergeable**: kmin_k(A ∪ B) ⊆ kmin_k(A) ∪ kmin_k(B), so the sketch
  of a union is computed from the sketches alone — per-shard sketches
  roll up to the corpus sketch without revisiting the data. This is the
  property HLL/theta sketches are built on; KMV is the variant whose
  arithmetic a SQL oracle can replay EXACTLY (no float registers, no
  stochastic averaging — just an order statistic over deterministic
  hashes), which is why it's the registry's sketch.
- **Estimator**: with hashes uniform on [0, M), the k-th smallest hash
  h_(k) of n distinct values satisfies E[h_(k)] ≈ k·M/(n+1); the
  unbiased estimate is  n̂ = (k-1) · M / h_(k)  with relative standard
  error ≈ 1/√(k-2). If the set has FEWER than k distinct hashes the
  sketch holds the whole set and the count is exact.
- **Resemblance**: for sets A, B with sketches K_A, K_B, let
  K_∪ = kmin_k(K_A ∪ K_B) (the union sketch — computable from the two
  sketches, see merge property). Every h ∈ K_∪ that belongs to A is
  necessarily in K_A (h ≤ kth(A∪B) ≤ kth(A)), so
  Ĵ = |K_∪ ∩ K_A ∩ K_B| / |K_∪| is a valid Jaccard estimator computed
  purely sketch-side (Beyer et al. §4).

Default hash: the repo's cross-engine polynomial fold
(dedup.shingle_hash, replayed in DuckDB by the registry's `_sh`
fragment) scrambled by an affine map mod FNV_MOD — the polynomial hash
has no avalanche (consecutive keys land on consecutive hashes, which
would bias minimum-order statistics badly), and multiplication by a
large odd constant mod the prime spreads contiguous inputs across the
full range (same argument as dedup.SIMHASH_SCRAMBLE_*). The ~2^30
range caps trustworthy estimates around the birthday bound (~2^15
distinct values per group before hash collisions bite); production
callers past that pass ``hash_col=kmv_hash64_col(...)`` /
``hash_range=KMV_HASH64_RANGE`` for a 62-bit xxhash64 domain — every
estimator here is parameterized on the range, only the ORACLE-replayable
default is pinned to the 30-bit fold.

Plan shape (the part that must survive 1000 executors): one shuffle to
distinct the (group, hash) pairs — narrow 16-byte rows with map-side
partial aggregation — then a per-group top-k (window rank for grouped
sketches; TakeOrderedAndProject for the global one, which is itself
per-partition k-min + single merge, i.e. the engine executes the
mergeable-sketch algorithm). No full-width column ever crosses an
exchange; the estimate aggregates are one narrow row per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from yat_geo_db_spark.pipelines.dedup import shingle_hash
from yat_geo_db_spark.pipelines.text import FNV_MOD

#: Affine scramble for the oracle-replayable KMV hash — xxHash avalanche
#: primes reduced mod FNV_MOD (distinct from dedup.SIMHASH_SCRAMBLE_* so
#: the two hash families stay uncorrelated). Odd, nonzero mod the prime →
#: the map h ↦ (h·A + B) mod M is a bijection on [0, M).
KMV_SCRAMBLE_A = 0xC2B2AE3D % FNV_MOD
KMV_SCRAMBLE_B = 0x27D4EB2F % FNV_MOD

#: Range of kmv_hash64_col (pmod of xxhash64 into [0, 2^62)).
KMV_HASH64_RANGE = 1 << 62

#: Default sketch size: RSE ≈ 1/√62 ≈ 12.7%, 512 bytes of longs per group.
KMV_DEFAULT_K = 64


def kmv_hash_col(value: Column) -> Column:
    """Oracle-replayable KMV hash: scrambled polynomial fold → [0, FNV_MOD).

    DuckDB mirror (pipeline_queries `_sh`):
    ``(_sh(v) * KMV_SCRAMBLE_A + KMV_SCRAMBLE_B) % FNV_MOD``."""
    return (
        shingle_hash(value) * F.lit(KMV_SCRAMBLE_A) + F.lit(KMV_SCRAMBLE_B)
    ) % F.lit(FNV_MOD)


def kmv_hash64_col(value: Column) -> Column:
    """Production-width KMV hash: xxhash64 folded into [0, 2^62) — JVM
    native, full avalanche, no oracle mirror (use for real corpora past
    the 30-bit birthday bound; pair with hash_range=KMV_HASH64_RANGE)."""
    return F.pmod(F.xxhash64(value), F.lit(KMV_HASH64_RANGE))


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int = KMV_DEFAULT_K,
    group_cols: tuple[str, ...] = (),
    hash_col: Column | None = None,
) -> DataFrame:
    """The sketch itself: k smallest DISTINCT hash values (per group).

    Returns ``[*group_cols, h]`` with ≤ k rows per group. One narrow
    shuffle distincts the (group, hash) pairs (16-byte rows, map-side
    combined); the top-k is a window rank per group, or — ungrouped —
    ``orderBy().limit(k)``, which Spark plans as TakeOrderedAndProject:
    per-partition k-min then one merge, the mergeable-sketch rollup
    executed by the engine."""
    if k < 2:
        raise ValueError(f"k must be ≥ 2 for the KMV estimator, got {k}")
    h = (hash_col if hash_col is not None
         else kmv_hash_col(F.col(value_col))).alias("h")
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, h)
        .distinct()
    )
    if not group_cols:
        return hashed.orderBy("h").limit(k)
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate_col(kept: Column, kth: Column, k: int,
                     hash_range: int = FNV_MOD) -> Column:
    """(k-1)·M / h_(k), exact when the group has fewer than k distinct
    hashes (the sketch then IS the set). 6-dp rounded double — the
    repo's cross-engine float canon."""
    return F.round(
        F.when(kept < F.lit(k), kept.cast("double")).otherwise(
            F.lit(float(k - 1)) * F.lit(float(hash_range)) / kth.cast("double")
        ),
        6,
    )


def kmv_distinct_estimate(
    df: DataFrame,
    value_col: str,
    k: int = KMV_DEFAULT_K,
    group_cols: tuple[str, ...] = (),
    hash_col: Column | None = None,
    hash_range: int = FNV_MOD,
) -> DataFrame:
    """Distinct-count estimate per group from the KMV sketch.

    Output: ``[*group_cols, sketch_k, kept, kth_hash, est_distinct]``.
    ``kept`` < k means the estimate is exact (whole set in the sketch)."""
    sk = kmv_sketch(df, value_col, k, group_cols, hash_col)
    agg = sk.groupBy(*group_cols).agg(
        F.count("h").alias("kept"), F.max("h").alias("kth_hash")
    )
    return agg.select(
        *group_cols,
        F.lit(k).alias("sketch_k"),
        "kept",
        "kth_hash",
        kmv_estimate_col(F.col("kept"), F.col("kth_hash"), k,
                         hash_range).alias("est_distinct"),
    )


def kmv_merge_sketches(
    sketches: list[DataFrame],
    k: int = KMV_DEFAULT_K,
) -> DataFrame:
    """Roll per-shard sketches up to the union's sketch WITHOUT the data:
    kmin_k(∪ S_i) = k smallest of the distinct union of the input
    sketches' hashes (every global k-min hash is a k-min hash of its own
    shard, so the union of sketches contains it). Inputs are ``[h]``
    frames (grouped sketches: drop the group columns first)."""
    if not sketches:
        raise ValueError("kmv_merge_sketches needs ≥ 1 sketch")
    u = sketches[0].select("h")
    for s in sketches[1:]:
        u = u.unionByName(s.select("h"))
    return u.distinct().orderBy("h").limit(k)


def kmv_pairwise_jaccard(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = KMV_DEFAULT_K,
    hash_col: Column | None = None,
) -> DataFrame:
    """Audience-overlap estimate for every unordered pair of groups,
    computed PURELY from the per-group sketches (the 100 TB shape: the
    full sets never meet — only ≤ 2k hashes per pair do).

    For pair (a, b): union sketch K_∪ = k smallest of K_a ∪ K_b;
    Ĵ(a,b) = |{h ∈ K_∪ : h ∈ K_a ∧ h ∈ K_b}| / |K_∪|  (membership in
    the originating sketches is sufficient — see module docstring).

    Output: ``[g1, g2, sketch_k, union_kept, both_in, jaccard_est]``
    with g1 < g2. Plan: per-group sketch (one narrow shuffle) → the
    tiny (#groups² × k)-row pair frame via a broadcast join on the
    distinct group list → window top-k per pair → one aggregate row per
    pair. Nothing here scales with |A| or |B| — only with k."""
    # materialize the sketch ONCE: it is referenced three times below
    # (group list + both pair sides), and Catalyst's ReusedExchange
    # can't dedup the differently-aliased subtrees — without this the
    # full scan + distinct shuffle would run ~3× (same contract as the
    # dedup index builds). ≤ k narrow rows per group, so the eager
    # checkpoint is tiny by construction.
    sk = kmv_sketch(df, value_col, k, (group_col,), hash_col).localCheckpoint()
    groups = sk.select(F.col(group_col).alias("_g")).distinct()
    pairs = (
        groups.select(F.col("_g").alias("g1"))
        .join(F.broadcast(groups.select(F.col("_g").alias("g2"))),
              F.col("g1") < F.col("g2"))
    )
    # each pair pulls both sides' sketch rows; flag which side each hash
    # came from, then rank the DISTINCT union hashes per pair. The pair
    # frame is #groups² rows — broadcast it so the sketch side never
    # shuffles for these joins (pinned: test_kmv_plan_shapes)
    side1 = sk.select(F.col(group_col).alias("g1"), "h")
    side2 = sk.select(F.col(group_col).alias("g2"), "h")
    u = (
        side1.join(F.broadcast(pairs), "g1")
        .select("g1", "g2", "h",
                F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            side2.join(F.broadcast(pairs), "g2")
            .select("g1", "g2", "h",
                    F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
        .groupBy("g1", "g2", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("g1", "g2").orderBy("h")
    topk = u.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return (
        topk.groupBy("g1", "g2")
        .agg(
            F.count("h").alias("union_kept"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("both_in"),
        )
        .select(
            "g1", "g2",
            F.lit(k).alias("sketch_k"),
            "union_kept",
            "both_in",
            F.round(
                F.col("both_in").cast("double")
                / F.col("union_kept").cast("double"),
                6,
            ).alias("jaccard_est"),
        )
    )
