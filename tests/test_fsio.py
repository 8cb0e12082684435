"""Direct coverage for the Hadoop FileSystem marker primitives (fsio)
and the crash behavior of the versioned-table commit protocol built on
them: data landing without a marker commit is invisible, a restart
publishes exactly once, and the enrichment sink always reads the
COMMITTED dimension version."""

from __future__ import annotations

import os

import pytest

from yat_geo_db_spark import fsio


def test_write_text_atomic_roundtrip_and_overwrite(spark, tmp_path):
    p = str(tmp_path / "marker")
    fsio.write_text_atomic(spark, p, "7")
    assert fsio.read_text(spark, p) == "7"
    # overwrite publishes the new content and leaves no .tmp behind
    fsio.write_text_atomic(spark, p, "through=9\ngen=2\npending=")
    assert fsio.read_text(spark, p) == "through=9\ngen=2\npending="
    assert not os.path.exists(p + ".tmp")
    assert fsio.exists(spark, p)


def test_read_text_missing_is_none(spark, tmp_path):
    assert fsio.read_text(spark, str(tmp_path / "nope")) is None


def test_list_dir_names_missing_root_is_empty(spark, tmp_path):
    assert fsio.list_dir_names(spark, str(tmp_path / "absent")) == []


def test_list_dir_names_dirs_only(spark, tmp_path):
    (tmp_path / "d1").mkdir()
    (tmp_path / "d2").mkdir()
    (tmp_path / "f1").write_text("x")
    got = sorted(fsio.list_dir_names(spark, str(tmp_path)))
    assert got == ["d1", "d2"]


def test_list_file_names_files_only_and_missing_root(spark, tmp_path):
    (tmp_path / "d1").mkdir()
    (tmp_path / "f1").write_text("x")
    (tmp_path / "_marker_g2").write_text("y")
    got = sorted(fsio.list_file_names(spark, str(tmp_path)))
    assert got == ["_marker_g2", "f1"]
    assert fsio.list_file_names(spark, str(tmp_path / "absent")) == []


def test_delete_recursive_and_exists(spark, tmp_path):
    d = tmp_path / "tree" / "leaf"
    d.mkdir(parents=True)
    (d / "f").write_text("x")
    root = str(tmp_path / "tree")
    assert fsio.exists(spark, root)
    assert fsio.delete(spark, root, recursive=True)
    assert not fsio.exists(spark, root)
    # deleting an absent path reports False, not an error
    assert not fsio.delete(spark, root, recursive=True)


def test_versioned_write_crash_leaves_orphan_invisible(spark, tmp_path):
    """A writer that crashed AFTER landing its data dir but BEFORE the
    marker commit must be invisible to readers (the marker is the
    commit), and the next successful write must publish exactly once,
    skipping over the orphan's slot rather than colliding with it."""
    from yat_geo_db_spark.relational.layout import (
        latest_version, read_version, versioned_write,
    )

    root = str(tmp_path / "dim")
    d0 = spark.createDataFrame([(1, "a")], "k int, val string")
    d1 = spark.createDataFrame([(1, "CRASHED")], "k int, val string")
    d2 = spark.createDataFrame([(1, "b")], "k int, val string")

    assert versioned_write(d0, root) == 0
    # crashed writer: v=1 data lands, marker never commits
    d1.write.parquet(f"{root}/v=1")
    assert latest_version(root, spark) == 0
    assert read_version(spark, root).collect() == d0.collect()
    # restart: the new write claims the next free slot and commits it
    v = versioned_write(d2, root)
    assert v == 2
    assert latest_version(root, spark) == 2
    assert read_version(spark, root).collect() == d2.collect()
    # time travel still serves the old committed version, not the orphan
    assert read_version(spark, root, 0).collect() == d0.collect()


def test_versioned_enrichment_sink_reads_committed_dim_only(
    spark, tmp_path
):
    """The enrichment sink re-resolves the dimension's COMMITTED
    version per batch: an uncommitted (crashed) dim refresh must not
    leak into enrichment, a committed refresh applies from the next
    batch, and a replayed batch re-enriches idempotently (overwrite by
    batch_id) with the current committed dim."""
    from yat_geo_db_spark.relational.layout import versioned_write
    from yat_geo_db_spark.streaming.sinks import (
        read_sink, versioned_enrichment_sink,
    )

    dim_root = str(tmp_path / "dim")
    target = str(tmp_path / "enriched")
    versioned_write(
        spark.createDataFrame([(1, "v0")], "k int, label string"), dim_root
    )
    sink = versioned_enrichment_sink(dim_root, ["k"], target)
    batch = spark.createDataFrame([(1, 10.0)], "k int, x double")

    sink(batch, 0)
    # crashed dim refresh: data dir lands, marker never moves
    spark.createDataFrame(
        [(1, "CRASHED")], "k int, label string"
    ).write.parquet(f"{dim_root}/v=1")
    sink(batch, 1)
    labels = {
        r["batch_id"]: r["label"]
        for r in read_sink(spark, target).collect()
    }
    assert labels == {0: "v0", 1: "v0"}

    # committed refresh applies from the next batch on
    versioned_write(
        spark.createDataFrame([(1, "v2")], "k int, label string"), dim_root
    )
    sink(batch, 2)
    # replayed batch 1 re-enriches with the CURRENT committed dim
    sink(batch, 1)
    labels = {
        r["batch_id"]: r["label"]
        for r in read_sink(spark, target).collect()
    }
    assert labels == {0: "v0", 1: "v2", 2: "v2"}
    # exactly one row per batch (replay overwrote, didn't append)
    assert read_sink(spark, target).count() == 3


def test_fsio_requires_classic_session():
    """A session object without the JVM gateway (Spark Connect shape)
    gets a clear error, not an AttributeError deep inside py4j."""

    class FakeConnectSession:
        _jvm = None

    with pytest.raises(RuntimeError, match="classic"):
        fsio.exists(FakeConnectSession(), "/tmp/x")


def test_vacuum_versions_prunes_committed_history_only(spark, tmp_path):
    """vacuum keeps the newest keep_last committed versions, never the
    latest or anything above the marker (orphan/in-flight dirs), and a
    rerun after partial progress is a no-op."""
    from yat_geo_db_spark.relational.layout import (
        latest_version, read_version, vacuum_versions, versioned_write,
    )

    root = str(tmp_path / "dim")
    for i in range(4):  # v0..v3 committed
        versioned_write(
            spark.createDataFrame([(i,)], "val int"), root
        )
    # orphan above the marker: a crashed/concurrent writer's dir
    spark.createDataFrame([(99,)], "val int").write.parquet(f"{root}/v=4")

    assert vacuum_versions(spark, root, keep_last=2) == [0, 1]
    assert latest_version(root, spark) == 3
    assert read_version(spark, root).collect()[0]["val"] == 3
    assert read_version(spark, root, 2).collect()[0]["val"] == 2
    with pytest.raises(Exception):
        read_version(spark, root, 0).collect()
    # the orphan survived (not committed -> not vacuum's to delete)
    assert fsio.exists(spark, f"{root}/v=4")
    # idempotent: nothing further to prune
    assert vacuum_versions(spark, root, keep_last=2) == []
    # keep_last is clamped: the committed latest can never be deleted
    assert vacuum_versions(spark, root, keep_last=0) == [2]
    assert read_version(spark, root).collect()[0]["val"] == 3
    # empty root: no marker, no-op
    assert vacuum_versions(spark, str(tmp_path / "none")) == []


def test_compact_small_files_republishes_versioned(spark, tmp_path):
    """compact_small_files: many tiny files -> few size-targeted files
    committed as a new version; rows identical; the source directory is
    untouched; a second compaction appends the next version (old ones
    retire via vacuum_versions)."""
    import glob

    from yat_geo_db_spark.relational.layout import (
        compact_small_files, read_version, small_file_report,
    )

    src = str(tmp_path / "messy")
    # ~tens of tiny files (hash repartition leaves some of the 64
    # partitions empty; empty partitions write no file)
    spark.range(64).repartition(64).write.parquet(src)
    n_src_files = small_file_report(spark, src).count()
    assert n_src_files > 20
    dest = str(tmp_path / "tidy")

    v = compact_small_files(spark, src, dest, target_mb=128)
    assert v == 0
    got = sorted(r["id"] for r in read_version(spark, dest).collect())
    assert got == list(range(64))
    # total bytes << 128 MB -> exactly one output file
    out_files = [
        f for f in glob.glob(f"{dest}/v=0/*") if f.endswith(".parquet")
    ]
    assert len(out_files) == 1
    # source untouched
    assert small_file_report(spark, src).count() == n_src_files
    # recompaction publishes the NEXT version, never mutates v=0
    assert compact_small_files(spark, src, dest) == 1
    assert read_version(spark, dest, 0).count() == 64


def test_read_bytes_raw_and_trailing_newline(spark, tmp_path):
    """read_bytes is byte-exact (no line-join normalization): a payload
    ending in a newline round-trips — the ADVICE r8 latent bug where
    write_text_atomic's fallback verify compared via read_text (which
    drops a trailing newline) and would spuriously report an
    already-committed marker as unknown."""
    p = str(tmp_path / "m")
    fsio.write_text_atomic(spark, p, "a=1\nb=2\n")
    assert fsio.read_bytes(spark, p) == b"a=1\nb=2\n"
    # read_text still normalizes (documented) — the verify must NOT
    assert fsio.read_text(spark, p) == "a=1\nb=2"
    assert fsio.read_bytes(spark, str(tmp_path / "nope")) is None


def test_list_data_files_snapshot(spark, tmp_path):
    """list_data_files: data files + _SUCCESS from ONE listing; hidden
    names and subdirectories excluded; absent dir -> ([], False)."""
    import os

    d = str(tmp_path / "t")
    spark.range(4).coalesce(2).write.parquet(d)
    files, ok = fsio.list_data_files(spark, d)
    assert ok and len(files) >= 1
    assert all(f.endswith(".parquet") for f in files)
    assert all(not f.startswith(("_", ".")) for f in files)
    assert files == sorted(files)
    # in-flight shape: no _SUCCESS, _temporary subdir only
    d2 = str(tmp_path / "inflight")
    os.makedirs(f"{d2}/_temporary")
    assert fsio.list_data_files(spark, d2) == ([], False)
    assert fsio.list_data_files(spark, str(tmp_path / "nope")) == ([], False)


def test_create_exclusive_wins_once(spark, tmp_path):
    """The lease primitive: exactly one creator wins, the loser sees
    False, and the winner's content is what lands."""
    from yat_geo_db_spark import fsio

    path = f"{tmp_path}/lease"
    assert fsio.create_exclusive(spark, path, "tok-a") is True
    assert fsio.create_exclusive(spark, path, "tok-b") is False
    assert fsio.read_bytes(spark, path) == b"tok-a"
    fsio.delete(spark, path, recursive=False)
    assert fsio.create_exclusive(spark, path, "tok-b") is True
    assert fsio.read_bytes(spark, path) == b"tok-b"


def test_activity_time_ms_sees_deep_committer_activity(spark, tmp_path):
    """ADVICE r9: FileOutputCommitter task activity lands TWO levels
    under the scratch dir (_temporary/<appAttempt>/_temporary/<task>),
    where the root's and the direct _temporary child's mtimes never
    move mid-job — the liveness scan must descend the hidden tree or a
    long fold reads as quiet and gets janitor-swept mid-flight."""
    import os
    import time

    from yat_geo_db_spark import fsio

    root = str(tmp_path / "gendir")
    inner = f"{root}/_temporary/0/_temporary"
    os.makedirs(f"{inner}/attempt_001")
    aged = time.time() - 7200
    aged_ms = int(aged * 1000)
    # everything a direct-children-only scan can see is ancient ...
    for p in (root, f"{root}/_temporary"):
        os.utime(p, (aged, aged))
    # ... but the task-attempt level (appAttempt's children) is fresh:
    # `inner`'s mtime moved when attempt_001 was created just now
    assert fsio.modification_time_ms(spark, root) <= aged_ms + 1000
    act = fsio.activity_time_ms(spark, root)
    assert act is not None and act > aged_ms + 3_000_000  # sees depth
    # absent dir stays None; a plain aged dir stays aged
    assert fsio.activity_time_ms(spark, f"{tmp_path}/nope") is None
