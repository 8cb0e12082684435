"""Z-order layout (relational.layout): the written files must carry
tight min/max stats on ALL indexed columns — the property parquet
stats-pruning feeds on — where a single-column sort leaves every other
column's per-file span at ~the full range."""

from __future__ import annotations

import glob

import duckdb
import pyspark.sql.functions as F

from yat_geo_db_spark.relational.layout import zorder_key, zorder_write
from yat_geo_db_spark.testdata import load_table

SF = "/root/testdata/sf0.01"


def _avg_file_spans(path: str, cols: list[str]) -> dict[str, float]:
    """Per-column average of (file max − file min) / global span over
    the layout's parquet files — 1.0 means a file tells the pruner
    nothing, near 0 means near-perfect pruning for point/range filters."""
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 4, f"expected a multi-file layout, got {files}"
    con = duckdb.connect()
    sel = ", ".join(f"min({c}), max({c})" for c in cols)
    glb = con.sql(
        f"SELECT {sel} FROM parquet_scan({files!r})"
    ).fetchone()
    spans = {c: 0.0 for c in cols}
    for f in files:
        row = con.sql(f"SELECT {sel} FROM '{f}'").fetchone()
        for j, c in enumerate(cols):
            gmin, gmax = glb[2 * j], glb[2 * j + 1]
            spans[c] += (row[2 * j + 1] - row[2 * j]) / float(gmax - gmin)
    return {c: s / len(files) for c, s in spans.items()}


def test_zorder_write_tightens_stats_on_all_columns(spark, tmp_path):
    events = load_table(spark, SF, "events")
    cols = ["user_id", "value"]

    zpath = str(tmp_path / "zorder")
    zorder_write(events, cols, zpath, n_files=16, bits=12)

    spath = str(tmp_path / "single")
    (
        events.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(spath)
    )

    z = _avg_file_spans(zpath, cols)
    s = _avg_file_spans(spath, cols)

    # single-column sort: tight on its own key, loose on the other
    assert s["user_id"] < 0.35
    assert s["value"] > 0.5
    # z-order: BOTH columns usefully tighter than the full range
    assert z["user_id"] < 0.45 and z["value"] < 0.45
    # and its worst column beats the single-sort's worst column by a lot
    assert max(z.values()) < 0.65 * max(s.values())

    # no rows lost or duplicated by the re-layout
    assert (
        spark.read.parquet(zpath).count() == events.count()
    )


def test_zorder_key_locality(spark):
    """Nearby z-values must mean nearby points: among the 200 smallest
    keys, bucket coordinates stay in the low quadrant of both dims
    (the curve never jumps to a far corner early)."""
    events = load_table(spark, SF, "events")
    keyed = zorder_key(events, ["user_id", "value"], bits=8, out_col="z")
    head = keyed.orderBy("z").limit(200)
    stats = head.agg(
        F.max("user_id").alias("mu"), F.max("value").alias("mv")
    ).first()
    full = events.agg(
        F.max("user_id").alias("mu"), F.max("value").alias("mv")
    ).first()
    assert stats["mu"] <= full["mu"] / 2
    assert stats["mv"] <= full["mv"] / 2


def test_zorder_null_rows_get_null_key(spark):
    """NULL indexed values must produce a NULL z-value (their own range
    group) — not silently co-locate with max-value rows, which would
    widen the high-end files' stats on every other column."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 500.0), (None, 20.0)],
        "a bigint, b double",
    )
    keyed = zorder_key(df, ["a", "b"], bits=4, out_col="z")
    rows = {(r["a"], r["b"]): r["z"] for r in keyed.collect()}
    assert rows[(2, None)] is None
    assert rows[(None, 20.0)] is None
    assert rows[(1, 10.0)] is not None and rows[(3, 500.0)] is not None


def test_manifest_pruned_read_matches_full_filter(spark, tmp_path):
    """build_manifest + pruned_read over a z-ordered layout: the pruned
    read must return exactly the rows of a full-scan filter while
    planning to read a strict subset of the files — on BOTH indexed
    columns (the z-order promise a single sort can't make)."""
    from yat_geo_db_spark.relational.layout import build_manifest, pruned_read

    events = load_table(spark, SF, "events")
    path = str(tmp_path / "z")
    zorder_write(events, ["user_id", "value"], path, n_files=16, bits=12)
    manifest = build_manifest(spark, path, ["user_id", "value"]).cache()
    assert manifest.count() >= 8

    for col, lo, hi in (("user_id", 10, 20), ("value", 100.0, 120.0)):
        got = pruned_read(spark, path, manifest, col, lo, hi)
        want = spark.read.parquet(path).filter(F.col(col).between(lo, hi))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        n_hit = manifest.filter(
            (F.col(f"min_{col}") <= hi) & (F.col(f"max_{col}") >= lo)
        ).count()
        assert n_hit < manifest.count(), (col, n_hit)

    # empty selection: range outside the domain plans zero files
    assert pruned_read(spark, path, manifest, "user_id", 10**6, 10**7).count() == 0


def test_bloom_manifest_point_read_identity_and_skipping(spark, tmp_path):
    """Point lookup through the per-file bloom manifest must return
    exactly the full-scan filter's rows while opening a strict subset
    of files; a value absent from the table must plan ~zero files
    (bounded false positives only)."""
    import pyspark.sql.functions as F
    from yat_geo_db_spark.relational.layout import (
        bloom_pruned_point_read,
        build_bloom_manifest,
    )
    from yat_geo_db_spark.testdata import load_table

    path = str(tmp_path / "orders_files")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    orders.repartition(8).write.mode("overwrite").parquet(path)
    man = build_bloom_manifest(spark, path, "o_orderkey").cache()
    n_files = man.select("file").distinct().count()
    assert n_files == 8

    probe_key = 777
    got = bloom_pruned_point_read(
        spark, path, man, "o_orderkey", probe_key
    )
    want = spark.read.parquet(path).filter(F.col("o_orderkey") == probe_key)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert want.count() > 0
    # the key lives in exactly one file; bloom may add a few fp files
    opened = len(got.inputFiles())
    assert 1 <= opened < n_files

    # absent key: no false negatives concern, near-zero files opened
    missing = bloom_pruned_point_read(
        spark, path, man, "o_orderkey", 10_000_000
    )
    assert missing.count() == 0
    assert len(missing.inputFiles()) <= 2


def test_small_file_report_and_advice(spark, tmp_path):
    """A deliberately fragmented table must report every file with
    exact row counts and trip the 'compact' verdict; a single-file
    rewrite of the same data must read 'ok'."""
    import pyspark.sql.functions as F
    from yat_geo_db_spark.relational.layout import (
        compaction_advice,
        small_file_report,
    )

    frag = str(tmp_path / "frag")
    df = spark.range(0, 50_000).withColumn("pad", F.lpad(F.col("id"), 64, "x"))
    df.repartition(32).write.mode("overwrite").parquet(frag)
    rep = small_file_report(spark, frag, target_mb=128).cache()
    rows = rep.collect()
    assert len(rows) == 32
    assert sum(r["n_rows"] for r in rows) == 50_000
    assert all(r["size_bytes"] > 0 for r in rows)
    verdict = compaction_advice(rep, target_mb=128).collect()[0]
    assert verdict["n_files"] == 32 and verdict["advice"] == "compact"
    assert verdict["recommended_files"] == 1

    solid = str(tmp_path / "solid")
    df.coalesce(1).write.mode("overwrite").parquet(solid)
    ok = compaction_advice(
        small_file_report(spark, solid, target_mb=1)
    ).collect()[0]
    assert ok["n_files"] == 1 and ok["advice"] == "ok"


def test_versioned_table_time_travel_and_diff(spark, tmp_path):
    """Versions are immutable and individually readable; the committed
    _latest marker governs the default read; version_diff round-trips
    through cdc_apply to reproduce the newer version exactly."""
    import pyspark.sql.functions as F
    from yat_geo_db_spark.relational.layout import (
        latest_version,
        read_version,
        version_diff,
        versioned_write,
    )
    from yat_geo_db_spark.relational.merge import cdc_apply

    root = str(tmp_path / "vt")
    v0_data = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, s string, x double"
    )
    assert versioned_write(v0_data, root) == 0
    v1_data = spark.createDataFrame(
        [(1, "a", 11.0), (3, "c", 30.0)], "k long, s string, x double"
    )
    assert versioned_write(v1_data, root) == 1
    assert latest_version(root) == 1

    assert sorted(map(tuple, read_version(spark, root, 0).collect())) == sorted(
        map(tuple, v0_data.collect())
    )
    assert sorted(map(tuple, read_version(spark, root).collect())) == sorted(
        map(tuple, v1_data.collect())
    )

    diff = version_diff(spark, root, 0, 1, ["k"])
    ops = {r["k"]: r["op"] for r in diff.collect()}
    assert ops == {1: "U", 2: "D", 3: "I"}

    # applying the diff to v0 reproduces v1 (snapshot_diff's contract,
    # exercised end-to-end through the version store)
    changes = diff.drop("changed").withColumn("version", F.lit(1))
    rebuilt = cdc_apply(
        read_version(spark, root, 0).withColumn("version", F.lit(0)),
        changes,
        ["k"],
        "version",
    )
    assert sorted(map(tuple, rebuilt.select("k", "s", "x").collect())) == sorted(
        map(tuple, v1_data.collect())
    )
