"""Hadoop FileSystem-API primitives for commit markers and layout dirs.

Commit markers (the ``_latest`` pointer of a versioned table, the
``_compacted_through`` watermark of a maintenance sink) must live on
the SAME filesystem as the data they describe. On the 100 TB target
deployment that filesystem is HDFS or an object store, where the
driver's POSIX ``open()``/``os.replace()`` never lands — a marker
written to the driver's local disk is invisible to every executor and
to the next driver. Everything here goes through the JVM Hadoop
FileSystem API of the SparkSession, so these primitives work wherever
``df.write.parquet`` works: local FS in tests, HDFS/S3A in production.

Atomic publish: :func:`write_text_atomic` writes ``<path>.tmp`` and
renames it over the target with FileContext ``Options.Rename.OVERWRITE``
— the same single-RPC atomic-rename commit Structured Streaming's
HDFSMetadataLog uses for its offset log. A plain ``FileSystem.rename``
refuses existing destinations, and delete-then-rename would open a
window in which a reader sees NO marker at all; FileContext closes it.
(On stores without atomic rename — raw S3 — the window collapses to a
single PUT, which is the best any marker scheme can do there.)

Requires a CLASSIC (JVM-backed) SparkSession: these primitives reach
the Hadoop FileSystem through ``spark._jvm``, which a Spark Connect
session does not expose. :func:`_jfs` raises a clear error on Connect
rather than failing deep inside py4j.
"""
from __future__ import annotations

from pyspark.sql import SparkSession


def _exc_is(exc: Exception, *suffixes: str) -> bool:
    """True if a py4j-wrapped Java exception is (caused by) one of the
    named exception classes — the listStatus/open race where the path
    vanishes between our call and the RPC, or the create-if-absent
    race where it appears. Callers translate these to the documented
    result instead of leaking a Py4JJavaError."""
    je = getattr(exc, "java_exception", None)
    while je is not None:
        try:
            if je.getClass().getName().endswith(suffixes):
                return True
            je = je.getCause()
        except Exception:
            return False
    return False


def _is_file_not_found(exc: Exception) -> bool:
    return _exc_is(exc, "FileNotFoundException")


def _session(spark) -> SparkSession:
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    if active is None:
        raise RuntimeError(
            "no active SparkSession — pass spark explicitly for "
            "filesystem marker access"
        )
    return active


def _jfs(spark, path: str):
    """(jvm, conf, fs, jpath) for the filesystem that owns `path`."""
    spark = _session(spark)
    if not hasattr(spark, "_jvm") or spark._jvm is None:
        raise RuntimeError(
            "fsio needs a classic (JVM-backed) SparkSession; Spark "
            "Connect sessions do not expose the Hadoop FileSystem API"
        )
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, conf, jpath.getFileSystem(conf), jpath


def exists(spark, path: str) -> bool:
    _, _, fs, p = _jfs(spark, path)
    return bool(fs.exists(p))


def delete(spark, path: str, recursive: bool = True) -> bool:
    _, _, fs, p = _jfs(spark, path)
    return bool(fs.delete(p, recursive))


def list_dir_names(spark, root: str) -> list[str]:
    """Child DIRECTORY basenames under `root` ([] if root is absent).
    One listStatus RPC — the layout-discovery primitive behind
    versioned tables and sink compaction."""
    _, _, fs, p = _jfs(spark, root)
    try:
        statuses = fs.listStatus(p)
    except Exception as e:  # direct call, no exists() pre-check: the
        # path can vanish between exists and listStatus — treat a
        # FileNotFoundException as the documented absent-root []
        if _is_file_not_found(e):
            return []
        raise
    return [
        st.getPath().getName()
        for st in statuses
        if st.isDirectory()
    ]


def list_file_names(spark, root: str) -> list[str]:
    """Child FILE basenames under `root` ([] if root is absent) — the
    sibling of list_dir_names for marker-file discovery (versioned
    compaction markers are found by listing, not by a fixed name)."""
    _, _, fs, p = _jfs(spark, root)
    try:
        statuses = fs.listStatus(p)
    except Exception as e:
        if _is_file_not_found(e):
            return []
        raise
    return [
        st.getPath().getName()
        for st in statuses
        if st.isFile()
    ]


def list_data_files(spark, dirpath: str) -> tuple[list[str], bool]:
    """ONE listStatus over `dirpath` → (sorted data-FILE basenames,
    ``_SUCCESS`` present). Hidden names (leading ``_`` or ``.`` —
    commit markers, CRC sidecars) and subdirectories (``_temporary``)
    are not data. An absent dir is ``([], False)``.

    Because both answers come from the SAME listStatus RPC, a caller
    that sees ``_SUCCESS`` in the snapshot also sees every part file
    of that commit (Spark's committer moves part files into place
    BEFORE writing ``_SUCCESS``) — the primitive behind snapshot-
    stable compaction folds and reads in :mod:`streaming.sinks`."""
    _, _, fs, p = _jfs(spark, dirpath)
    try:
        statuses = fs.listStatus(p)
    except Exception as e:
        if _is_file_not_found(e):
            return [], False
        raise
    names, success = [], False
    for st in statuses:
        n = st.getPath().getName()
        if n == "_SUCCESS":
            success = True
        elif st.isFile() and not n.startswith(("_", ".")):
            names.append(n)
    return sorted(names), success


def modification_time_ms(spark, path: str) -> int | None:
    """Modification time of `path` in epoch millis (one getFileStatus),
    or None if it does not exist — the age signal behind grace-guarded
    janitor deletes (a dir younger than the grace period may belong to
    an in-flight writer and must not be reclaimed)."""
    _, _, fs, p = _jfs(spark, path)
    try:
        return int(fs.getFileStatus(p).getModificationTime())
    except Exception as e:
        if _is_file_not_found(e):
            return None
        raise


def activity_time_ms(spark, dirpath: str) -> int | None:
    """Latest modification time across `dirpath`, its direct children,
    and the committer scratch tree, in epoch millis — or None if
    absent. The liveness signal a janitor must age against: a
    directory being written by a committer shows a static root mtime
    for the whole job (part files land only at job commit), and task
    activity lands TWO levels under the hidden scratch dir
    (``_temporary/<appAttempt>/_temporary/<taskAttempt>``), so the
    direct ``_temporary`` child's mtime moves only at job setup. This
    therefore descends two listing levels under each hidden
    (``_``/``.``-prefixed) child dir — reaching the ``<appAttempt>``
    dir (mtime advances on each task commit) and the inner
    ``_temporary`` dir (mtime advances as task attempts are created).
    Cost is bounded: 1 getFileStatus + 1 listStatus at the root, plus
    one listStatus per hidden child and per ITS child dirs (normally
    2 extra RPCs total: ``_temporary`` and the single app attempt);
    data subdirectories (partition layouts) are never descended.

    Object-store caveat (S3A): fake directories report mtime 0, so a
    scratch tree whose listings are all fake dirs can still read as
    ancient — consumers must treat a mistimed sweep as survivable
    (sinks._compact_generational re-verifies its own output before
    commit and aborts loudly; test-pinned in test_streaming)."""
    _, _, fs, p = _jfs(spark, dirpath)

    def scan(jpath, depth: int, hidden_tree: bool) -> int | None:
        try:
            statuses = fs.listStatus(jpath)
        except Exception as e:
            if _is_file_not_found(e):  # vanished mid-scan (task
                # attempt committed/cleaned) — activity, but its
                # parent's mtime already moved, so just skip
                return None
            raise
        latest = None
        for st in statuses:
            mt = int(st.getModificationTime())
            latest = mt if latest is None else max(latest, mt)
            name = st.getPath().getName()
            if (
                depth > 0
                and st.isDirectory()
                and (hidden_tree or name.startswith(("_", ".")))
            ):
                sub = scan(st.getPath(), depth - 1, True)
                if sub is not None:
                    latest = max(latest, sub)
        return latest

    try:
        latest = int(fs.getFileStatus(p).getModificationTime())
    except Exception as e:
        if _is_file_not_found(e):
            return None
        raise
    deep = scan(p, 2, False)
    return max(latest, deep) if deep is not None else latest


def create_exclusive(spark, path: str, text: str) -> bool:
    """Create `path` with `text` IFF it does not already exist —
    ``FileSystem.create(path, overwrite=false)``, the create-if-absent
    primitive behind lease files. Returns True on success, False if
    the path already exists (someone else holds it).

    Atomicity is filesystem-dependent. On HDFS the no-overwrite create
    is a single atomic NameNode operation — exactly one of N racing
    callers wins. On the LOCAL filesystem (RawLocalFileSystem) and on
    classic S3A the existence check is CLIENT-SIDE (exists-then-create
    / HEAD-then-PUT), so two racers in the same instant can BOTH see
    success. Lease consumers must therefore pair this with a content
    re-read before any irreversible step (sinks._compact_generational
    re-verifies its token pre-commit AND pre-delete), which degrades a
    lost race on those filesystems to a loud abort-and-retry, never a
    silent double-commit.

    Failure residue: if the create RPC itself fails transiently AFTER
    the namespace entry lands (no stream to write the token), the
    fallback 'exists ⇒ held' classification returns False against the
    caller's own zero-byte debris — sinks._acquire_compact_lease
    breaks empty lease files past a short grace so that phantom can
    never wedge compaction for a full lease window.

    The content-write failure path below reclaims ONLY a still-EMPTY
    file (a blind delete could destroy a concurrent winner's healthy
    content at the same path — fatal when the file is a commit
    marker). The deliberate residue: a PARTIAL flush that leaves a
    non-empty, unparseable file is NOT reclaimed here and needs the
    manual remedy sinks._parse_marker's corrupt-marker error spells
    out — a tiny window (single-packet payloads), traded against the
    delete-recreate race."""
    _, _, fs, p = _jfs(spark, path)
    try:
        out = fs.create(p, False)
    except Exception as e:
        if _exc_is(
            e, "FileAlreadyExistsException", "PathExistsException"
        ) or (not _is_file_not_found(e) and bool(fs.exists(p))):
            return False
        raise
    try:
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
    except Exception:
        # the create WON but the content write failed: a zero-byte
        # file left behind would be a lease nobody holds / a commit
        # slot nobody owns — reclaim best-effort before propagating.
        # Reclaim ONLY a still-empty file: between the failed write
        # and this delete, a debris-breaker may have removed our
        # zero-byte entry and a NEW holder created healthy content at
        # the same path — deleting blindly would destroy their
        # committed file (fatal when the created file IS a commit
        # marker; see sinks._commit_marker_exclusive).
        try:
            if fs.getFileStatus(p).getLen() == 0:
                fs.delete(p, False)
        except Exception:
            pass
        raise
    return True


def read_bytes(spark, path: str) -> bytes | None:
    """Raw bytes of a (small) file, or None if it does not exist.
    Unlike :func:`read_text` this performs NO newline normalization —
    it is the comparison primitive for commit verification, where a
    payload ending in a newline must not spuriously mismatch."""
    jvm, _, fs, p = _jfs(spark, path)
    try:
        stream = fs.open(p)
    except Exception as e:
        if _is_file_not_found(e):
            return None
        raise
    try:
        return bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()


def read_text(spark, path: str) -> str | None:
    """Full text of a (small) file, or None if it does not exist.
    Marker files are a handful of bytes — one open + one read."""
    jvm, _, fs, p = _jfs(spark, path)
    try:
        stream = fs.open(p)
    except Exception as e:  # no exists() pre-check (same race as
        # list_dir_names): missing file is the documented None
        if _is_file_not_found(e):
            return None
        raise
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()


def write_text_atomic(spark, path: str, text: str) -> None:
    """Publish `text` at `path` atomically: write `<path>.tmp`, then
    FileContext.rename(..., Rename.OVERWRITE) over the target. Readers
    see either the previous committed content or the new one — never a
    partial write and never a missing marker."""
    spark = _session(spark)
    jvm, conf, fs, dst = _jfs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            dst.toUri(), conf
        )
        gw = spark.sparkContext._gateway
        rename_opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        rename_opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, dst, rename_opts)
    except Exception as fc_err:
        # FileContext may be unsupported by exotic FS impls; fall back
        # to rename-first: only if the rename is refused (existing
        # destination) do we delete the old marker and retry, so a
        # total failure leaves the PREVIOUS committed marker intact
        # instead of destroying the commit pointer. The delete+retry
        # leg is non-atomic (a reader in the gap sees no marker and
        # treats the table as uncommitted — safe, not wrong).
        if not fs.rename(tmp, dst):
            if not fs.exists(tmp):
                # the FileContext rename may have APPLIED server-side
                # with the error raised client-side (timeout /
                # interrupt): tmp is gone, so deleting dst here could
                # destroy the marker we just committed. Verify by
                # RAW content (read_bytes — read_text's line-join would
                # drop a trailing newline and fail the verify on a
                # payload that actually committed) without touching
                # anything.
                if read_bytes(spark, path) == text.encode("utf-8"):
                    return
                raise IOError(
                    f"marker commit state unknown: {tmp} vanished but "
                    f"{dst} does not carry the new content"
                ) from fc_err
            fs.delete(dst, False)
            if not fs.rename(tmp, dst):
                raise IOError(
                    f"marker rename failed: {tmp} -> {dst}"
                ) from fc_err
