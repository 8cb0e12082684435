"""Batch MERGE / upsert — latest-wins per key without a table format.

Parquet has no transactional MERGE (that's Delta/Iceberg territory); the
portable batch pattern is union + per-key version rank + rewrite, which is
exactly how periodic compaction jobs apply change sets at scale: one
shuffle on the merge key, map-side nothing (row_number needs the full key
group), output partitioned however the base table is laid out. The
reference's closest analog is `add_entity`'s copy-append upsert
(geo_manager.py:451-476) — this is its engine-grade generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
import pyspark.sql.functions as F

from yat_geo_db_spark.relational.queries import dsum


def _latest_rows(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    order_cols,
) -> DataFrame:
    """Union base (tagged _src=0) with updates (_src=1) and keep the
    first row per key under `order_cols` — the shared version-rank core
    of upsert_latest and cdc_apply (one hash shuffle on the key)."""
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Apply `updates` over `base`: for every key keep the row with the
    highest version; on version ties the update wins (deterministic via a
    source tag in the sort — never arbitrary). Columns must align
    (unionByName). One hash shuffle on the key."""
    return _latest_rows(
        base, updates, key_cols, [F.desc(version_col), F.desc("_src")]
    )


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change stream (op ∈ 'I'/'U'/'D') to a snapshot — the
    Debezium-shaped compaction every lakehouse runs without a table
    format: per key, the highest-version record decides; if that record
    is a delete the key disappears, otherwise its payload wins (inserts
    and updates are deliberately not distinguished — late/replayed
    streams blur them, and last-writer-wins is the portable semantics).

    Same scale shape as upsert_latest (shared _latest_rows core): one
    union + ONE hash shuffle on the key for the version rank, deletes
    filtered after the rank (a delete must still outrank older upserts
    to suppress them). Snapshot rows act as version-tagged upserts;
    change-stream ties beat snapshot ties, and among change-stream rows
    tied on version the DELETE wins ('D' < 'I' < 'U' ascending — the
    conservative outcome for a replayed stream; never partition-order
    dependent). Two same-version upserts with different payloads remain
    ambiguous by construction — real CDC streams version uniquely per
    key, which is the documented precondition. `changes` carries the
    snapshot's columns plus `op_col`.

    The op ∈ {I,U,D} domain is ENFORCED, not just documented: a change
    row with any other op (including NULL — a malformed upstream record)
    raises at execution. Without the guard, Spark's asc sort puts NULL
    first, so a NULL-op row at the top version would outrank same-version
    D/I/U rows and then be silently dropped by the `op != 'D'` filter
    (NULL comparison) — deleting the key with no delete record."""
    guarded_op = F.when(
        F.col(op_col).isin("I", "U", "D"), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cdc_apply: op must be one of 'I','U','D', got "),
                F.coalesce(F.col(op_col), F.lit("NULL")),
            )
        )
    )
    kept = _latest_rows(
        snapshot.withColumn(op_col, F.lit("U")),
        changes.withColumn(op_col, guarded_op),
        key_cols,
        [F.desc(version_col), F.desc("_src"), F.asc(op_col)],
    )
    return kept.filter(F.col(op_col) != "D").drop(op_col)


def partial_aggregate(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
    scale: int = 4,
) -> DataFrame:
    """Per-key MERGEABLE aggregate state: (keys, n_rows, sum_<c>…,
    min_<c>…, max_<c>…) — the partial-aggregation representation an
    incrementally-maintained rollup table stores instead of raw rows.

    The sums go through `dsum` fixed-point accumulation, which makes the
    state EXACTLY associative: merging per-batch states (see
    merge_partial_aggregates) reproduces a one-shot aggregation of all
    rows bit-for-bit, for ANY split of the data into batches — the
    property that lets a 100 TB rollup be maintained by aggregating only
    each day's increment (O(batch)) and merging O(keys) state, never
    rescanning history. Plain float sums lose this (addition order
    drifts); count/min/max are natively associative."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    aggs += [dsum(F.col(c), scale).alias(f"sum_{c}") for c in sum_cols]
    aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
    return df.groupBy(*key_cols).agg(*aggs)


def merge_partial_aggregates(
    states: list[DataFrame],
    key_cols: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
    scale: int = 4,
) -> DataFrame:
    """Merge partial_aggregate states (the base rollup table + one or
    more batch states) into one: counts add, fixed-point sums re-add
    exactly (each stored sum is a multiple of 10^-scale, so the dsum
    round-trip is lossless), mins/maxs fold. ONE hash shuffle on the
    key over O(keys_per_state) rows — the whole point: the merge never
    touches raw history. Keys new to a batch appear, existing keys
    update; the result is itself a valid state for the next merge."""
    from functools import reduce

    merged = reduce(lambda a, b: a.unionByName(b), states)
    aggs = [F.sum("n_rows").alias("n_rows")]
    aggs += [dsum(F.col(f"sum_{c}"), scale).alias(f"sum_{c}") for c in sum_cols]
    aggs += [F.min(f"min_{c}").alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(f"max_{c}").alias(f"max_{c}") for c in max_cols]
    return merged.groupBy(*key_cols).agg(*aggs)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Derive the CDC change stream BETWEEN two table versions — the
    inverse of cdc_apply, and the standard way a lakehouse backfills a
    change feed when the upstream never emitted one: op='I' for keys
    only in `new`, 'D' for keys only in `old`, 'U' for keys whose
    compared columns differ (null-safely); unchanged keys are dropped.
    `changed` lists the differing columns for 'U' rows (comma-joined,
    deterministic column order) — the audit trail schema-drift reviews
    read. Payload columns carry the NEW values ('D' rows keep the old
    key only).

    ONE full-outer hash join on the key — O(|old|+|new|) with no
    other shuffle; applying the result back onto `old` via cdc_apply
    reproduces `new` exactly (property-tested)."""
    compare_cols = (
        [c for c in new.columns if c not in key_cols]
        if compare_cols is None else list(compare_cols)
    )
    o = old.select(
        *key_cols, *[F.col(c).alias(f"_old_{c}") for c in compare_cols]
    ).withColumn("_in_old", F.lit(True))
    n = new.select(*key_cols, *compare_cols).withColumn(
        "_in_new", F.lit(True)
    )
    j = o.join(n, key_cols, "full_outer")
    # key-only tables are a legitimate membership diff: no payload to
    # compare, so no key can ever be 'U'
    any_diff = F.lit(False)
    for c in compare_cols:
        any_diff = any_diff | ~F.col(c).eqNullSafe(F.col(f"_old_{c}"))
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("I"))
        .when(F.col("_in_new").isNull(), F.lit("D"))
        .when(any_diff, F.lit("U"))
    )
    changed = F.when(
        op == "U",
        F.concat_ws(
            ",",
            *[
                F.when(
                    ~F.col(c).eqNullSafe(F.col(f"_old_{c}")), F.lit(c)
                )
                for c in compare_cols
            ],
        ),
    ).otherwise(F.lit(""))
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(*key_cols, *compare_cols, "op", changed.alias("changed"))
    )


def histogram_state(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Per-key MERGEABLE quantile state: a fixed-bin histogram
    (keys, bin, n) over the declared domain [lo, hi] — the piece
    partial_aggregate cannot give an incrementally-maintained rollup
    (quantiles don't decompose into sums). Out-of-domain values clamp
    into the edge bins, so no row is ever dropped; the bin domain is a
    CONTRACT — states merge only with identically-binned states, which
    is why lo/hi are explicit arguments and not data-derived.

    Integer counts ⇒ exactly associative: merging per-batch states
    (merge_histogram_states) equals the one-shot histogram for any
    split. One map-side-combinable groupBy; O(keys × n_bins) state.

    NULL measurements are EXCLUDED (count them upstream if they
    matter): without the filter, Spark's null-skipping greatest() would
    silently count a NULL as a bin-0 (minimum-value) observation and
    bias every quantile toward lo."""
    width = (hi - lo) / float(n_bins)
    raw = F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("bin", b)
        .groupBy(*key_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_histogram_states(
    states: list[DataFrame], key_cols: list[str]
) -> DataFrame:
    """Fold per-batch histogram states (same key/bin domain) into one —
    integer count adds, one hash shuffle over O(keys × n_bins) rows."""
    from functools import reduce

    merged = reduce(lambda a, b: a.unionByName(b), states)
    return merged.groupBy(*key_cols, "bin").agg(F.sum("n").alias("n"))


def quantile_from_histogram(
    state: DataFrame,
    key_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Per-key quantile estimates from a (merged) histogram state:
    linear interpolation inside the covering bin, error bounded by one
    bin width ((hi-lo)/n_bins) by construction. qs must lie in (0, 1].

    Scale shape: one key-local cumulative window over n_bins rows per
    key, a broadcast cross join against the tiny qs frame, and a filter
    selecting the single covering bin per (key, q) — no sort of the
    underlying data, which never has to exist again once its state is
    folded in."""
    spark = state.sparkSession
    width = (hi - lo) / float(n_bins)
    qf = F.broadcast(
        spark.createDataFrame([(float(q),) for q in qs], "q double")
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*key_cols)
    cum = state.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wt)
    )
    j = cum.crossJoin(qf)
    target = F.col("q") * F.col("total").cast("double")
    covering = j.filter(
        (F.col("cum").cast("double") >= target)
        & ((F.col("cum") - F.col("n")).cast("double") < target)
    )
    est = (
        F.lit(lo)
        + F.lit(width)
        * (
            F.col("bin").cast("double")
            + (target - (F.col("cum") - F.col("n")).cast("double"))
            / F.col("n").cast("double")
        )
    )
    return covering.select(
        *key_cols, "q", F.round(est, 6).alias("quantile_est")
    )


#: numeric widening ladder for schema evolution (index = rank)
_WIDEN_LADDER = ["tinyint", "smallint", "int", "bigint", "float", "double"]


def evolve_union(dfs: list[DataFrame]) -> DataFrame:
    """Union frames whose schemas EVOLVED across ingestion batches: the
    output carries the union of all columns, each at the WIDEST numeric
    type seen (tinyint→…→double ladder), with missing columns NULL —
    the read-side half of schema evolution a table format would give
    you, expressed over plain frames. Non-numeric type conflicts
    (string vs long, timestamp vs date) raise instead of silently
    casting: an ingestion pipeline must decide those, not a union.

    Column order follows first appearance across the batch list, so
    the result is deterministic regardless of which batch happens to
    carry the widest type."""
    if not dfs:
        raise ValueError("evolve_union needs at least one frame")
    order: list[str] = []
    widest: dict[str, str] = {}
    for df in dfs:
        for name, dtype in df.dtypes:
            if name not in widest:
                order.append(name)
                widest[name] = dtype
                continue
            cur = widest[name]
            if dtype == cur:
                continue
            if dtype in _WIDEN_LADDER and cur in _WIDEN_LADDER:
                if _WIDEN_LADDER.index(dtype) > _WIDEN_LADDER.index(cur):
                    widest[name] = dtype
            else:
                raise ValueError(
                    f"evolve_union: column {name!r} has incompatible types "
                    f"{cur!r} and {dtype!r} — only the numeric widening "
                    "ladder is auto-reconciled"
                )
    out = None
    for df in dfs:
        have = dict(df.dtypes)
        cols = [
            (
                F.col(c).cast(widest[c])
                if c in have
                else F.lit(None).cast(widest[c])
            ).alias(c)
            for c in order
        ]
        part = df.select(*cols)
        out = part if out is None else out.unionByName(part)
    return out
