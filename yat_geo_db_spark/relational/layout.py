"""Multi-dimensional data layout — z-order (Morton-curve) clustering.

At 100 TB the scan IS the query cost, and parquet prunes files and row
groups by min/max column statistics. A single-column sort gives perfect
stats-pruning on that column and NONE on any other; interleaving the
bits of several range-bucketed columns — the z-order curve, the same
layout Delta's OPTIMIZE ZORDER BY and Iceberg sort orders use — gives
every indexed column partial locality, so a selective filter on ANY of
them skips most files. The write costs one extra range shuffle once;
every subsequent scan pays less forever.

Everything here is integer/IEEE arithmetic in pure Column expressions
(whole-stage codegen, no UDF), so the key computation has an exact
DuckDB mirror (queries.relational_queries rel_zorder_key).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def linear_bucket(
    col: Column, cmin: Column, cmax: Column, bits: int
) -> Column:
    """Map a numeric column into [0, 2^bits) by linear range bucketing
    over [cmin, cmax] (the min/max come from ONE tiny agg row broadcast
    back — no per-row window). Constant columns (span 0) bucket to 0;
    the max value is clamped into the top bucket. NULL values bucket to
    NULL (propagating to a NULL z-value, which repartitionByRange
    groups into its own files) — without the explicit guard, Spark's
    null-skipping least() would co-locate NULL rows with MAX-value
    rows and widen those files' stats on every other column."""
    n = 1 << bits
    span = cmax.cast("double") - cmin.cast("double")
    raw = F.floor(
        (col.cast("double") - cmin.cast("double")) / span * F.lit(float(n))
    )
    return F.when(
        col.isNotNull(),
        F.when(span > 0, F.least(raw, F.lit(n - 1))).otherwise(F.lit(0)),
    ).cast("long")


def zvalue_col(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave the low `bits` bits of k bucket columns into one
    Morton key: bit i of column j lands at position i*k + j. The terms
    occupy disjoint bit positions, so plain addition assembles the key
    (stays in int64 while bits*k <= 62). Pure shift/mask expression
    tree — codegen'd, engine-portable."""
    k = len(bucket_cols)
    assert bits * k <= 62, f"zvalue needs bits*k <= 62, got {bits}*{k}"
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
        for j, c in enumerate(bucket_cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a + b, terms)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12, out_col: str = "_zval"
) -> DataFrame:
    """Add the z-order key over `cols`: one min/max aggregate of the
    indexed columns (a 1-row frame, broadcast back — the only job
    besides the scan), then per-row bucketing + bit interleave as a
    pure projection."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    stats = F.broadcast(df.agg(*aggs))
    buckets = [
        linear_bucket(
            F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits
        )
        for c in cols
    ]
    keyed = df.crossJoin(stats).withColumn(
        out_col, zvalue_col(buckets, bits)
    )
    drop = [f"_min_{c}" for c in cols] + [f"_max_{c}" for c in cols]
    return keyed.drop(*drop)


def zorder_write(
    df: DataFrame, cols: list[str], path: str,
    n_files: int = 16, bits: int = 12,
) -> str:
    """Write `df` z-ordered by `cols`: range-partition on the Morton key
    into ~n_files files, sort within each file, drop the key. Each
    output file then covers a compact hyper-rectangle of the indexed
    columns, so its parquet min/max stats are tight on ALL of them —
    the pruning property a single-column sort only gives one column.
    One range shuffle (plus Spark's boundary-sampling pass) at write
    time; no state beyond the files themselves."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def build_manifest(
    spark, path: str, cols: list[str]
) -> DataFrame:
    """File-level min/max statistics table for a parquet directory —
    the table-format-free data-skipping index (the information a
    Delta/Iceberg manifest stores): one scan grouped by
    input_file_name(), output O(files) rows of
    (file, n_rows, min_<c>, max_<c> …). Pair with zorder_write, whose
    layout makes these ranges tight on every indexed column."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(*aggs)
    )


def pruned_read(
    spark, path: str, manifest: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Read only the files whose [min, max] range intersects [lo, hi],
    then apply the residual filter — exactly what a table-format
    planner does with its manifest, expressed over plain parquet. The
    manifest is O(files); collecting the surviving file list is a
    driver-side planning step, not a data read. Row-identical to
    filtering the full scan (test-pinned); the win is the files never
    opened."""
    hits = manifest.filter(
        (F.col(f"min_{col}") <= F.lit(hi)) & (F.col(f"max_{col}") >= F.lit(lo))
    )
    files = [r["file"] for r in hits.select("file").collect()]
    full = spark.read.parquet(path)
    if not files:
        return full.filter(F.lit(False))
    return (
        spark.read.parquet(*files)
        .filter(F.col(col).between(F.lit(lo), F.lit(hi)))
    )


def build_bloom_manifest(
    spark, path: str, col: str, m_bits: int = 1 << 13, k_hashes: int = 4
) -> DataFrame:
    """Per-FILE Bloom filters for a high-cardinality column — the
    point-lookup complement to build_manifest's min/max ranges (ranges
    skip nothing for an equality probe on an unsorted high-card key;
    a 1 KiB-per-file bloom skips every file that cannot contain it).
    One scan grouped by (input_file_name, word): output
    O(files × m_bits/64) long rows — the manifest stays a sketch.
    Same position derivation as relational.skew's bloom (Murmur3 +
    literal seeds), so probe expressions line up by construction."""
    from yat_geo_db_spark.relational.skew import _bit_mask, _bloom_positions

    df = spark.read.parquet(path)
    return (
        df.withColumn("file", F.input_file_name())
        .where(F.col(col).isNotNull())
        .select(
            "file",
            F.explode(
                _bloom_positions(F.col(col), m_bits, k_hashes)
            ).alias("_pos"),
        )
        .select(
            "file",
            (F.col("_pos") / 64).cast("int").alias("word"),
            _bit_mask(F.col("_pos")).alias("_mask"),
        )
        .groupBy("file", "word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_pruned_point_read(
    spark,
    path: str,
    bloom_manifest: DataFrame,
    col: str,
    value,
    m_bits: int = 1 << 13,
    k_hashes: int = 4,
) -> DataFrame:
    """Equality-probe read that opens only the files whose Bloom filter
    might contain `value`: derive the probe's (word, required-bits)
    pairs with the SAME hash expressions the builder used (a 1-row
    engine job — never a Python reimplementation of Murmur3 that could
    drift), keep files satisfying EVERY probe word, and apply the exact
    residual filter. No false negatives ⇒ row-identical to filtering
    the full scan (test-pinned); false positives only cost extra file
    opens, bounded by the m/n ratio."""
    from yat_geo_db_spark.relational.skew import _bit_mask, _bloom_positions

    full = spark.read.parquet(path)
    # Murmur3 hashes by PHYSICAL width: lit(777) is INT while the column
    # may be BIGINT — hash(int 777) != hash(bigint 777). Cast the probe
    # to the column's own type so builder and probe hash identical bytes.
    col_type = dict(full.dtypes)[col]
    probe = (
        spark.range(1)
        .select(
            F.explode(
                _bloom_positions(
                    F.lit(value).cast(col_type), m_bits, k_hashes
                )
            ).alias("_pos")
        )
        .select(
            (F.col("_pos") / 64).cast("int").alias("word"),
            _bit_mask(F.col("_pos")).alias("_mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("_mask").alias("req"))
    )
    req_rows = probe.collect()
    n_req = len(req_rows)
    req_df = F.broadcast(
        spark.createDataFrame(
            [(r["word"], r["req"]) for r in req_rows], "word int, req long"
        )
    )
    sat = (
        bloom_manifest.join(req_df, "word")
        .where(
            F.col("bits").bitwiseAND(F.col("req")) == F.col("req")
        )
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_ok"))
        .where(F.col("n_ok") == n_req)
    )
    files = [r["file"] for r in sat.select("file").collect()]
    if not files:
        return full.filter(F.lit(False))
    return spark.read.parquet(*files).filter(F.col(col) == F.lit(value))


def _parquet_file_sizes(spark, path: str) -> dict[str, int]:
    """{full_path: size_bytes} for every .parquet file under `path`
    (recursive, Hadoop FileSystem API) — the single listing shared by
    small_file_report and compact_small_files so suffix handling can
    never diverge between the diagnostic and the action. Keys are FULL
    paths: basenames can collide across nested subdirectories, which
    would silently undercount totals."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = fs_path.getFileSystem(conf)
    sizes: dict[str, int] = {}
    it = fs.listFiles(fs_path, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if p.endswith(".parquet"):
            sizes[p] = st.getLen()
    return sizes


def small_file_report(spark, path: str, target_mb: int = 128) -> DataFrame:
    """Small-file health check for a parquet directory — the scan-cost
    diagnostic behind every compaction decision (a 100 TB table in 4 MB
    files pays ~32× the open/footer/seek overhead of 128 MB files and
    floods the driver with splits). One scan groups row counts per
    input_file_name; sizes come from the Hadoop FileSystem API (works
    on any FS the session can read, not just local). Returns one row
    per file: (file, n_rows, size_bytes, under_quarter_target) plus
    the derived rows/MB — feed it to compaction_advice for the
    summary verdict."""
    rows = (
        spark.read.parquet(path)
        .withColumn(
            # join key is the BASENAME: input_file_name() and the
            # FileSystem API print the same path with different URI
            # normalization (file:/// vs file:/) — basenames are unique
            # within a parquet dir by construction (part-NNNNN-uuid)
            "file",
            F.element_at(F.split(F.input_file_name(), "/"), -1),
        )
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    sizes = {
        p.rsplit("/", 1)[-1]: n
        for p, n in _parquet_file_sizes(spark, path).items()
    }
    size_df = F.broadcast(
        spark.createDataFrame(
            list(sizes.items()), "file string, size_bytes long"
        )
    )
    quarter = target_mb * 1024 * 1024 // 4
    return rows.join(size_df, "file").select(
        "file",
        "n_rows",
        "size_bytes",
        (F.col("size_bytes") < F.lit(quarter)).alias("under_quarter_target"),
        F.round(
            F.col("n_rows")
            / (F.col("size_bytes") / F.lit(1024.0 * 1024.0)),
            2,
        ).alias("rows_per_mb"),
    )


def compaction_advice(report: DataFrame, target_mb: int = 128) -> DataFrame:
    """One-row verdict over a small_file_report: file count, total
    bytes, median file size, the share of files under target/4, and
    the file count a target_mb compaction would produce. Advice is
    'compact' when over half the files are under a quarter of the
    target — the point where open/footer overhead dominates scans."""
    mb = 1024.0 * 1024.0
    return report.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size_bytes").alias("total_bytes"),
        F.round(
            F.expr("percentile(size_bytes, 0.5)") / mb, 3
        ).alias("median_mb"),
        F.round(
            F.avg(F.col("under_quarter_target").cast("double")), 6
        ).alias("small_share"),
        F.greatest(
            F.ceil(F.sum("size_bytes") / F.lit(target_mb * mb)),
            F.lit(1).cast("long"),
        ).alias("recommended_files"),
    ).withColumn(
        "advice",
        F.when(F.col("small_share") > 0.5, F.lit("compact")).otherwise(
            F.lit("ok")
        ),
    )


def compact_small_files(
    spark, path: str, dest_root: str, target_mb: int = 128
) -> int:
    """ACT on a 'compact' verdict: rewrite a small-file parquet
    directory into `recommended_files` size-targeted files, published
    as a new committed VERSION under `dest_root` (versioned_write — the
    atomic _latest marker means readers never see a half-written
    rewrite, and the original directory is never touched, so a crash
    mid-compaction costs nothing). Returns the committed version.

    The file count comes from the same total-bytes/target math as
    compaction_advice (never from n_rows — row width varies), and the
    rewrite is one repartition(n): a full shuffle, which is the point —
    it rebalances pathological file-size skew instead of coalescing
    neighbors into whatever uneven partitions the scan produced.
    Retire old versions afterwards with vacuum_versions."""
    total = sum(_parquet_file_sizes(spark, path).values())
    if total == 0:
        raise ValueError(f"nothing to compact: no parquet files under {path!r}")
    # same ceil(total / target) as compaction_advice's recommended_files
    n_files = max(1, -(-total // (target_mb * 1024 * 1024)))
    return versioned_write(
        spark.read.parquet(path).repartition(int(n_files)), dest_root
    )


# --------------------------------------------------------------------------
# versioned tables: time travel over plain parquet
# --------------------------------------------------------------------------

def _version_dirs(root: str, spark=None) -> list[int]:
    import re as _re

    from yat_geo_db_spark import fsio

    out = []
    for d in fsio.list_dir_names(spark, root):
        m = _re.fullmatch(r"v=(\d+)", d)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def versioned_write(df: DataFrame, root: str) -> int:
    """Append a new immutable VERSION of a table: the frame lands in
    root/v=N (N = latest+1) and a _latest marker is committed by
    write-temp-then-atomic-rename AFTER the data write succeeds —
    readers pointed at the marker never see a half-written version
    (the poor-man's snapshot isolation a table format gives you; same
    marker discipline as the rollup sink's _compacted_through). Marker
    and directory listing go through the Hadoop FileSystem API (fsio),
    so the commit works on HDFS/object storage, not just the driver's
    local disk. Old versions stay readable for time travel until you
    prune them."""
    from yat_geo_db_spark import fsio

    spark = df.sparkSession
    versions = _version_dirs(root, spark)
    v = (versions[-1] + 1) if versions else 0
    df.write.mode("errorifexists").parquet(f"{root}/v={v}")
    fsio.write_text_atomic(spark, f"{root}/_latest", str(v))
    return v


def latest_version(root: str, spark=None) -> int:
    """Committed latest version per the marker (NOT the max dir: a
    crashed writer may have left a data dir without committing). Reads
    through the Hadoop FS API so the answer is the same on every
    node/filesystem the session can see."""
    from yat_geo_db_spark import fsio

    txt = fsio.read_text(spark, f"{root}/_latest")
    try:
        return int(txt.strip()) if txt is not None else -1
    except ValueError:
        return -1


def read_version(spark, root: str, version: int | None = None) -> DataFrame:
    """Time-travel read: the given version, or the committed latest."""
    v = latest_version(root, spark) if version is None else version
    if v < 0:
        raise ValueError(f"no committed version under {root!r}")
    return spark.read.parquet(f"{root}/v={v}")


def vacuum_versions(spark, root: str, keep_last: int = 2) -> list[int]:
    """Prune old versions of a versioned table: delete every COMMITTED
    version older than the newest `keep_last`, and return the deleted
    version numbers. Completes the lifecycle versioned_write's
    docstring promises ('old versions stay readable until you prune').

    Safety invariants:
    - the committed latest is never deleted (keep_last is clamped ≥ 1);
    - versions ABOVE the marker are never touched — a dir without a
      marker commit is either a crashed writer's orphan (harmless, its
      slot is skipped) or a concurrent writer mid-commit (deleting it
      would race the rename);
    - deletion runs oldest-first and never moves the marker, so a crash
      mid-vacuum leaves a valid table (a contiguous-suffix of history
      survives, latest untouched) — re-run to finish;
    - all listing/deletes go through the Hadoop FS API (fsio), same as
      the commit path.
    Time travel to a vacuumed version fails on read, which is the
    contract (same as VACUUM on any table format)."""
    from yat_geo_db_spark import fsio

    keep_last = max(1, keep_last)
    latest = latest_version(root, spark)
    if latest < 0:
        return []
    committed = [v for v in _version_dirs(root, spark) if v <= latest]
    doomed = committed[: max(0, len(committed) - keep_last)]
    for v in doomed:
        fsio.delete(spark, f"{root}/v={v}", recursive=True)
    return doomed


def version_diff(
    spark, root: str, v_old: int, v_new: int, key_cols: list[str]
) -> DataFrame:
    """Change feed between two committed versions — relational.merge.
    snapshot_diff over the two time-travel reads, so applying the
    result to v_old via cdc_apply reproduces v_new exactly (the
    round-trip snapshot_diff already proves)."""
    from yat_geo_db_spark.relational.merge import snapshot_diff

    return snapshot_diff(
        read_version(spark, root, v_old),
        read_version(spark, root, v_new),
        key_cols,
    )
