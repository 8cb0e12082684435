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

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from yat_geo_db_spark import fsio


def batch_partitioned_parquet_sink(target_dir: str):
    """Return a foreachBatch function writing each micro-batch to
    ``<target>/batch_id=N`` (overwrite → replay-idempotent). Compose with
    any per-batch transformation before `.writeStream.foreachBatch(...)`.
    Paths are joined with '/' (URI form), so the target may live on any
    Hadoop filesystem — local in tests, HDFS/S3A in production."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{target_dir}/batch_id={batch_id}"
        )

    return write_batch


def read_sink(spark, target_dir: str) -> DataFrame:
    """Read the sink back as one dataset (partition column = batch_id)."""
    return spark.read.option("basePath", target_dir).parquet(
        f"{target_dir}/batch_id=*"
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
        survivors.write.mode("overwrite").parquet(
            f"{target_dir}/batch_id={batch_id}"
        )

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
        survivors.write.mode("overwrite").parquet(
            f"{target_dir}/batch_id={batch_id}"
        )

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


_MARKER = "_compacted_through"
_MARKER_V_PREFIX = "_compacted_through_g"
_GEN_PREFIX = "_compacted_g"


def _marker_name(gen: int) -> str:
    return f"{_MARKER_V_PREFIX}{gen}"


def _read_marker(spark, root: str) -> tuple[int, int, list[str], str]:
    """Read the compaction commit pointer
    → (through, gen, pending, gendir).

    Discovery is VERSIONED (round 11, closing the recorded deferral):
    each committed generation has its own marker file
    ``_compacted_through_g<gen>`` created atomically-if-absent
    (fsio.create_exclusive — see _commit_marker_exclusive), and the
    reader takes the HIGHEST generation found in one listStatus. A
    ZERO-BYTE versioned marker is a failed commit's debris (the create
    won the namespace entry but the content write failed; that run
    propagated its error and its fold dirs are intact) — it is
    SKIPPED, falling back to the next-lower generation, which is
    exactly the pre-commit state. A marker that vanishes between the
    listing and its read was superseded-and-swept — re-list. The
    legacy single-file ``_compacted_through`` (pre-versioned layout)
    is honored when no versioned marker exists.

    - ``through``: highest batch_id folded into the committed
      generation (-1 = never compacted). A replayed batch at or below
      it must NOT rewrite its dir — its rows already live in the
      compacted generation, and recreating the dir would double-count.
    - ``gen``: the committed compacted-generation number (0 = none).
    - ``pending``: dir basenames whose content IS folded into the
      committed generation but whose deletion may not have finished —
      readers must exclude them, compaction deletes them on resume.
    - ``gendir``: the basename of the committed generation dir.
      Generation dirs carry a per-run unique suffix
      (``_compacted_g<gen>-<token>``) so two compactors that both read
      gen=g can never overwrite each other's output path — only the
      marker decides which one committed. Markers written before the
      suffix scheme name the fixed ``_compacted_g<gen>``.

    All marker I/O goes through :mod:`yat_geo_db_spark.fsio` (Hadoop
    FileSystem API; same-generation updates publish by atomic rename),
    so the marker lives on the SAME filesystem as the data and a crash
    mid-update can never leave a truncated marker. A NON-empty marker
    that fails to parse is therefore real corruption and raises rather
    than being silently read as 'never compacted' (which would
    replay-double-count)."""
    legacy_retried = False
    for _ in range(8):
        gens: list[int] = []
        for nm in fsio.list_file_names(spark, root):
            if nm.startswith(_MARKER_V_PREFIX):
                try:
                    gens.append(int(nm[len(_MARKER_V_PREFIX):]))
                except ValueError:
                    continue  # .tmp of an atomic update, foreign file
        retry = False
        for g in sorted(gens, reverse=True):
            txt = fsio.read_text(spark, f"{root}/{_marker_name(g)}")
            if txt is None:
                retry = True  # superseded & swept mid-read — re-list
                break
            if txt.strip() == "":
                continue  # failed-commit debris: fall to gen below
            return _parse_marker(root, _marker_name(g), txt, expect=g)
        if retry:
            continue
        txt = fsio.read_text(spark, f"{root}/{_MARKER}")
        if txt is None:
            if not gens and not legacy_retried:
                # the FIRST-EVER versioned commit plus its legacy-file
                # sweep (_cleanup_superseded_markers) can land between
                # our (empty) versioned listing and this read — a bare
                # caller would see a stale 'never compacted' (-1) view.
                # Re-list ONCE; a genuinely never-compacted root lists
                # empty again and returns the sentinel on the next pass.
                legacy_retried = True
                continue
            return -1, 0, [], f"{_GEN_PREFIX}0"
        return _parse_marker(root, _MARKER, txt, expect=None)
    raise RuntimeError(
        f"compaction markers at {root} kept vanishing between listing "
        "and read — compaction storm?"
    )


def _parse_marker(
    root: str, name: str, txt: str, expect: int | None,
) -> tuple[int, int, list[str], str]:
    lines = [ln.strip() for ln in txt.strip().splitlines() if ln.strip()]
    try:
        if len(lines) == 1 and "=" not in lines[0]:
            # legacy single-int marker (pre-generational layout, state
            # in batch_id=-1 — folded on the next compact_rollup)
            return int(lines[0]), 0, [], f"{_GEN_PREFIX}0"
        fields = dict(ln.partition("=")[::2] for ln in lines)
        gen = int(fields.get("gen", "0"))
        if expect is not None and gen != expect:
            raise ValueError(f"marker names gen={gen}, filename says {expect}")
        return (
            int(fields["through"]),
            gen,
            [p for p in fields.get("pending", "").split(",") if p],
            fields.get("gendir", f"{_GEN_PREFIX}{gen}"),
        )
    except (KeyError, ValueError) as e:
        raise ValueError(
            f"corrupt compaction marker at {root}/{name}: {txt!r} — "
            "likely a failed commit's PARTIAL content flush (non-empty, "
            "unparseable; the zero-byte reclaim in fsio.create_exclusive "
            "cannot touch it). Manual remedy: if a higher-generation "
            "healthy marker exists, or this generation's fold dirs are "
            "intact on disk, delete this file; readers then resume from "
            "the next-lower committed generation. Do NOT delete a marker "
            "whose generation dir exists and whose fold dirs are gone — "
            "that one committed and the corruption is real bit-rot."
        ) from e


def _marker_text(
    through: int, gen: int, pending: list[str], gendir: str,
) -> str:
    return (
        f"through={through}\ngen={gen}\npending={','.join(pending)}"
        f"\ngendir={gendir}"
    )


def _write_marker(
    spark, root: str, through: int, gen: int, pending: list[str],
    gendir: str | None = None,
) -> None:
    """SAME-GENERATION marker update (pending-clear after the fold-dir
    deletes, resume of a crashed cleanup) — an atomic-rename overwrite
    of that generation's own file. Never used to COMMIT a new
    generation: that is _commit_marker_exclusive's create-if-absent,
    and exactly one racing compactor can win it. gen=0 only arises for
    legacy layouts, whose pointer is the legacy file."""
    gendir = gendir if gendir is not None else f"{_GEN_PREFIX}{gen}"
    path = (
        f"{root}/{_marker_name(gen)}" if gen >= 1 else f"{root}/{_MARKER}"
    )
    fsio.write_text_atomic(
        spark, path, _marker_text(through, gen, pending, gendir)
    )


#: a ZERO-BYTE versioned marker older than this is failed-commit
#: debris (namespace create won, content write failed, reclaim delete
#: failed too) — a later commit to that generation may break it; a
#: younger one may be a commit mid-write on an FS without atomic
#: create+content visibility
_EMPTY_MARKER_GRACE_MS = 60_000


def _commit_marker_exclusive(
    spark, root: str, through: int, gen: int, pending: list[str],
    gendir: str,
) -> int | None:
    """COMMIT at generation `gen` (or the next free slot above it):
    create ``_compacted_through_g<g>`` with the full marker text IFF
    it does not exist (fsio.create_exclusive); returns the generation
    actually committed, or None if a concurrent compaction won. This
    is the compare-and-swap the old last-writer-wins marker write
    lacked: of two compactors that both survived validation (one
    having stalled past the lease), exactly one can create a given gen
    file — the loser gets None and aborts before any delete, so two
    compactors can never BOTH believe they committed. On filesystems
    whose no-overwrite create is client-side (classic S3A) this
    degrades to the post-create content verify in
    _compact_generational_locked, exactly as the lease degrades to its
    token verify (see fsio.create_exclusive).

    A zero-byte gen file past _EMPTY_MARKER_GRACE_MS is a FAILED
    commit's residue (that run raised; readers skip empty markers). It
    must not wedge the root forever — but unlike the lease, marker
    debris is NEVER broken by delete: a delete-then-recreate race on
    the commit pointer could destroy a concurrent winner's committed
    marker (the stalled original creator's failed-write reclaim
    deletes whatever sits at the path — fine for a lease, fatal for a
    commit). Instead the commit ESCALATES to the next generation
    number: readers take the highest NON-EMPTY marker, so an empty
    slot below a healthy one is simply dead weight that a later
    commit's cleanup removes — and if the slot's original creator ever
    finishes its write, its marker is outranked and its run fails the
    content verify before deleting anything."""
    import time

    g = gen
    for _ in range(8):  # bounded escalation past dead empty slots
        path = f"{root}/{_marker_name(g)}"
        if fsio.create_exclusive(
            spark, path, _marker_text(through, g, pending, gendir)
        ):
            return g
        mt = fsio.modification_time_ms(spark, path)
        if mt is None:
            continue  # vanished (cleaned by a later commit) — retry g
        if int(time.time() * 1000) - mt < _EMPTY_MARKER_GRACE_MS:
            return None  # fresh: a live commit (or one mid-write)
        content = fsio.read_bytes(spark, path)
        if content is None:
            continue  # vanished between stat and read — retry g
        if content == b"":
            g += 1  # dead empty slot: escalate, never delete
            continue
        return None  # a healthy commit occupies this slot — lost
    return None


def _cleanup_superseded_markers(spark, root: str, gen: int) -> None:
    """Best-effort removal of marker files below the committed `gen`
    (and the legacy single-file marker): readers always take the MAX
    generation, so stale lower markers are harmless — this only keeps
    the root from accumulating one small file per generation. A reader
    holding a pre-cleanup listing re-lists when the swept file reads
    as None (see _read_marker). Deleting an EMPTY sub-gen slot is safe
    even against its stalled original creator: if that run's content
    write ever lands, its outranked marker fails the run's post-create
    content verify before it deletes anything.

    Operational note: removing the legacy ``_compacted_through`` file
    means a PRE-versioned-layout reader pointed at this root would see
    'never compacted' and silently undercount — upgrade compactors and
    readers of a shared root together (single-version operation is
    this repo's deployment model)."""
    for nm in fsio.list_file_names(spark, root):
        drop = nm == _MARKER
        if nm.startswith(_MARKER_V_PREFIX):
            try:
                drop = int(nm[len(_MARKER_V_PREFIX):]) < gen
            except ValueError:
                drop = False
        if drop:
            try:
                fsio.delete(spark, f"{root}/{nm}", recursive=False)
            except Exception:
                pass  # hygiene only; never outranks the committed state


def _compacted_through(spark, root: str) -> int:
    return _read_marker(spark, root)[0]


def _rollup_state_paths(spark, root: str) -> list[str]:
    """Concrete parquet FILE paths of every live rollup state: the
    committed compacted generation (if any), the legacy batch_id=-1
    dir, and all batch_id=N dirs EXCEPT those the marker lists as
    pending-delete (already folded into the committed generation —
    reading them too would double-count).

    File paths, not dir paths: a replayed ``mode=overwrite`` of a
    batch dir between this snapshot and the downstream read then makes
    the read FAIL LOUDLY (the snapshotted part files are gone — Spark
    part-file names are job-unique, so an overwrite never reuses them)
    instead of silently scanning a half-rewritten directory. Per-dir
    files and the ``_SUCCESS`` commit flag come from the SAME
    listStatus (fsio.list_data_files), so a dir observed committed is
    observed with its complete part-file set."""
    # marker-list-marker snapshot loop: the marker is read BEFORE and
    # AFTER the listing, and the listing only counts if the marker did
    # not move — otherwise a compaction committing between the two
    # reads could leave us holding gen N's view of gen N+1's directory
    # contents (old generation gone, folded dirs gone → silent
    # undercount). Deletes happen strictly AFTER the marker commit, so
    # an unchanged marker brackets a consistent view.
    for _ in range(8):
        marker = through, gen, pending, gendir = _read_marker(spark, root)
        names = fsio.list_dir_names(spark, root)
        if _read_marker(spark, root) != marker:
            continue
        if gen >= 1 and gendir not in names:
            # the marker names a committed generation that is not on
            # disk (manual deletion, partial restore): reading without
            # it would return a large silent undercount — fail loudly,
            # exactly like the corrupt-marker path.
            raise FileNotFoundError(
                f"compaction marker at {root} names generation dir "
                f"{gendir!r} but it does not exist — state corrupted "
                "(manual deletion / partial restore?)"
            )
        pend = set(pending)
        paths: list[str] = []
        state_dirs: list[str] = []
        if gen >= 1:
            state_dirs.append(gendir)
        for n in sorted(names):
            if not n.startswith("batch_id=") or n in pend:
                continue
            bid = _batch_dir_id(n)
            # a batch dir at or below `through` is a STALE REPLAY — a
            # sink that passed its marker gate just before a compaction
            # commit and recreated a dir whose rows already live in the
            # committed generation (the sink self-deletes it right
            # after; see _gated_batch_writer). Counting it would
            # double. Exempt the legacy batch_id=-1 compacted dir: it
            # IS prior state, not a batch. Non-numeric suffixes (manual
            # backups) are ignored.
            if bid is None or (bid != -1 and bid <= through):
                continue
            state_dirs.append(n)
        gen_uncommitted = False
        for n in state_dirs:
            files, committed = fsio.list_data_files(spark, f"{root}/{n}")
            if n == gendir and not committed:
                # the marker-named generation is absent or mid-delete
                # HERE (after the bracketed dir listing): either a
                # compaction just committed gen+1 and is deleting the
                # old one — the final marker re-check below will catch
                # that and retry — or the dir is genuinely gone, which
                # only the unchanged marker can prove. Defer the
                # verdict; never raise on a healthy racing compaction.
                gen_uncommitted = True
                break
            # skip batch dirs whose write is still in flight (no
            # _SUCCESS in the same listing as the files): reading one
            # would see a partial batch; it becomes visible on the
            # next read, like any batch that had not landed yet
            if committed:
                paths.extend(f"{root}/{n}/{f}" for f in files)
        if _read_marker(spark, root) != marker:
            continue
        if gen_uncommitted:
            raise FileNotFoundError(
                f"committed generation dir {root}/{gendir} is absent "
                "or has no _SUCCESS while the marker still names it — "
                "state corrupted (manual deletion / partial restore?)"
            )
        break
    else:
        raise RuntimeError(
            f"rollup marker at {root} kept changing — compaction storm?"
        )
    if not paths:
        raise FileNotFoundError(f"no rollup state under {root}")
    return paths


def _gated_batch_writer(root: str, build):
    """The replay-safe per-batch write protocol shared by the
    maintenance sinks: gate on the marker, write the state dir, then
    RE-CHECK the marker and self-delete if a compaction committed this
    batch id in between. The pre-write gate alone has a TOCTOU hole —
    a replayed batch can read `through = id-1`, a concurrent
    compaction then commits `through = id` (having folded the OLD
    dir), and the late write recreates a dir whose rows already live
    in the committed generation. The post-write re-check closes it:
    whichever order the marker commit and this write land in, a dir at
    or below `through` is ignored by readers and by the next
    compaction (both filter `id <= through`) and is deleted HERE.
    `build(batch_df)` maps the micro-batch to its state frame.

    A replayed write physically OVERLAPPING an external compactor's
    fold of the same dir is also safe: the fold reads a concrete
    part-FILE snapshot and re-validates it before its commit
    (_compact_generational), so the overlap makes the COMPACTION abort
    or fail loudly and retry — never silently fold a half-rewritten
    dir. Running compaction from the stream's own foreachBatch cadence
    (where writes and folds serialize) avoids even those retries."""
    inner = batch_partitioned_parquet_sink(root)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id <= _compacted_through(spark, root):
            # also resume a CRASHED self-delete (below): a leftover
            # stale dir is invisible to readers/compaction and nothing
            # else would ever reclaim it
            fsio.delete(spark, f"{root}/batch_id={batch_id}",
                        recursive=True)
            return
        inner(build(batch_df), batch_id)
        if batch_id <= _compacted_through(spark, root):
            # lost the race against a concurrent compaction: this
            # batch's rows are already in the committed generation
            fsio.delete(spark, f"{root}/batch_id={batch_id}",
                        recursive=True)

    return write_batch


#: a generation dir younger than this is never swept as an orphan —
#: it may belong to a compactor that is about to commit it
ORPHAN_GRACE_MS = 3_600_000

#: a compaction lease file younger than this is live — a second
#: compactor refuses to start; older, it is presumed crashed and broken
COMPACT_LEASE_MS = 3_600_000

_LEASE_NAME = "_compact_lease"

#: a ZERO-BYTE lease file older than this is debris (created but the
#: token write failed and the reclaim delete also failed) — a live
#: holder writes its token immediately after the create, so an empty
#: file this old has no holder and may be broken without waiting the
#: full lease window
_EMPTY_LEASE_GRACE_MS = 60_000


def _acquire_compact_lease(spark, root: str, lease_ms: int) -> str:
    """Take the per-root compaction lease: atomically create
    ``<root>/_compact_lease`` holding a unique token (fsio.
    create_exclusive). If the file exists and is younger than
    `lease_ms` a live compactor holds it — raise (loud refusal, state
    untouched). Older, it belongs to a crashed run: break it (delete)
    and retry the create ONCE; losing that second race also raises.

    Lease-breaking is itself racy (two breakers can interleave
    delete/create so the eventual file holds only one token) — which
    is why every holder re-verifies its token via _verify_compact_lease
    immediately before the marker commit and before the fold-dir
    deletes: a broken-and-stolen lease turns into a loud abort there,
    never a silent double-commit."""
    import time
    import uuid

    token = uuid.uuid4().hex
    path = f"{root}/{_LEASE_NAME}"
    for _ in range(2):
        if fsio.create_exclusive(spark, path, token):
            return token
        mt = fsio.modification_time_ms(spark, path)
        if mt is not None and (
            int(time.time() * 1000) - mt >= _EMPTY_LEASE_GRACE_MS
        ):
            content = fsio.read_bytes(spark, path)
            if content is None:
                # the lease vanished between the mtime read and the
                # content read (its holder released, or a concurrent
                # breaker removed debris) — the stale `mt` says nothing
                # about any CURRENT lease, so retry the create instead
                # of falling through to a spurious age-based refusal
                continue
            if content == b"":
                # ZERO-BYTE lease older than the short grace: debris
                # from a create that won the namespace entry but never
                # wrote its token (a transient failure between create
                # and write — a live holder writes the token
                # immediately after creating). Without this, the
                # phantom wedges compaction for a full lease window.
                # Re-check IMMEDIATELY before the delete: between the
                # first emptiness read and here, another breaker may
                # have deleted the debris and a NEW holder created a
                # healthy lease — deleting that would strand the new
                # holder into its pre-commit verify-abort. The re-check
                # narrows that window to one RPC gap; the RESIDUAL
                # (delete landing on a lease created inside the gap) is
                # not excluded, and degrades to the standard loud
                # abort: the displaced holder fails its token verify
                # before commit and before any delete — wasteful
                # (a paid fold discarded), never wrong.
                mt2 = fsio.modification_time_ms(spark, path)
                if mt2 == mt and fsio.read_bytes(spark, path) == b"":
                    fsio.delete(spark, path, recursive=False)
                continue
        if mt is not None and int(time.time() * 1000) - mt < lease_ms:
            raise RuntimeError(
                f"compaction of {root} refused: a concurrent compaction "
                f"holds the lease ({_LEASE_NAME} is "
                f"{int(time.time() * 1000) - mt} ms old, lease window "
                f"{lease_ms} ms) — state unchanged; rerun later or pass "
                "a smaller lease_ms to break a known-dead holder"
            )
        fsio.delete(spark, path, recursive=False)
    raise RuntimeError(
        f"compaction of {root} refused: lost the lease-break race to a "
        "concurrent compaction — state unchanged; rerun"
    )


def _verify_compact_lease(spark, root: str, token: str) -> bool:
    got = fsio.read_bytes(spark, f"{root}/{_LEASE_NAME}")
    return got == token.encode("utf-8")


def _release_compact_lease(spark, root: str, token: str) -> None:
    """Drop the lease iff it still carries our token — a broken-and-
    stolen lease belongs to the thief and must not be deleted under
    them. Best-effort: a transient FS error here must not replace the
    run's real outcome (a committed compaction reporting failure, or a
    meaningful abort's diagnostic being swallowed) — an unreleased
    lease self-heals when it ages past the lease window. The swallowed
    exception is WARNED, not silent (ADVICE r10): an unreleased lease
    wedges every compaction of this root for a full lease window, and
    with no trace the wedge is undiagnosable (and a programming error
    in the fsio path would hide behind the same blanket except)."""
    try:
        if _verify_compact_lease(spark, root, token):
            fsio.delete(spark, f"{root}/{_LEASE_NAME}", recursive=False)
    except Exception as exc:
        import warnings

        warnings.warn(
            f"best-effort compaction-lease release at {root} failed "
            f"({type(exc).__name__}: {exc}); the lease self-heals after "
            "the lease window, but compactions of this root are wedged "
            "until then",
            RuntimeWarning,
            stacklevel=2,
        )


def _sweep_orphan_generations(
    spark, root: str, grace_ms: int | None = None
) -> None:
    """Reclaim generation dirs left by compactors that crashed between
    their fold write and their marker commit. Two guards make this
    safe against CONCURRENT compactors (whose output this janitor must
    never destroy):

    - age: a dir with filesystem ACTIVITY within `grace_ms` is skipped
      (fsio.activity_time_ms — the root mtime is static for the whole
      fold job because part files land only at job commit, but the
      ``_temporary`` child's mtime advances as tasks run, so an
      in-flight fold reads as live). A live run commits its marker
      within moments of finishing, so a quiet unnamed dir older than
      the grace is presumed crashed;
    - per-candidate marker re-read: the marker is re-read immediately
      before EACH delete, so a generation committed after this run's
      snapshot is recognized and spared. (And even a mistimed delete
      cannot poison the marker: the owning compactor re-verifies its
      own output dir right before its commit and aborts if it is
      gone.)

    The remaining window needs a fold with NO filesystem activity for
    the entire grace that then wakes up and commits within the
    check-to-delete RPC gap — pass a `grace_ms` sized to the slowest
    plausible task when folds run long (compact_* functions expose
    it). Object-store caveat: S3A reports fake-directory mtimes as 0,
    so a mid-fold dir whose only direct child is the ``_temporary``
    fake dir can read as ancient — on S3A size the grace to the whole
    fold duration (or run the janitor only from the compaction cadence
    itself, where no concurrent fold exists). Even a mistimed sweep
    cannot poison the marker: the owning compactor re-verifies its own
    output immediately before its commit and aborts loudly."""
    import time

    if grace_ms is None:
        grace_ms = ORPHAN_GRACE_MS
    now_ms = int(time.time() * 1000)
    for n in fsio.list_dir_names(spark, root):
        if not n.startswith(_GEN_PREFIX):
            continue
        mt = fsio.activity_time_ms(spark, f"{root}/{n}")
        if mt is None or now_ms - mt < grace_ms:
            continue
        _, _, pend, cur_gendir = _read_marker(spark, root)
        if n != cur_gendir and n not in pend:
            fsio.delete(spark, f"{root}/{n}", recursive=True)


def _batch_dir_id(name: str) -> int | None:
    """batch_id= dir name → its integer id, or None for non-batch dirs
    (manual backups like 'batch_id=3.bak' must degrade to 'ignored',
    not crash every reader)."""
    try:
        return int(name.split("=", 1)[1])
    except ValueError:
        return None


def rollup_maintenance_sink(
    root: str,
    key_cols: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
    scale: int = 4,
):
    """foreachBatch maintenance of an incrementally-updated rollup
    table: each micro-batch is reduced to its mergeable
    partial_aggregate state and handed to the shared batch_id=N
    overwrite writer (batch_partitioned_parquet_sink) — so a replayed
    batch REPLACES its own state instead of double-counting (the
    merge-twice hazard that makes naive read-merge-overwrite sinks
    wrong under at-least-once foreachBatch). Batches already folded by
    compact_rollup (id <= the _compacted_through marker) are skipped on
    replay for the same reason: their rows live in the compacted dir.
    Readers fold all batch states with read_rollup; because the state
    is exactly associative (fixed-point sums), stream-then-merge equals
    a batch aggregation of everything ever streamed, bit-for-bit.

    Scale shape per batch: one map-side-combinable groupBy of the
    batch only — O(batch) work, state O(keys). The batch_id dirs grow
    with stream lifetime; compact_rollup folds them back to one
    (run it on whatever cadence keeps reader-side merge cheap)."""
    from yat_geo_db_spark.relational.merge import partial_aggregate

    return _gated_batch_writer(
        root,
        lambda batch_df: partial_aggregate(
            batch_df, key_cols, sum_cols=sum_cols, min_cols=min_cols,
            max_cols=max_cols, scale=scale,
        ),
    )


def read_rollup(
    spark,
    root: str,
    key_cols: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
    scale: int = 4,
) -> DataFrame:
    """Merge-on-read of a rollup_maintenance_sink target: fold every
    live state dir — the committed compacted generation plus the
    batch_id=N dirs the marker doesn't exclude — into the current
    per-key aggregates (ONE hash shuffle over O(batches × keys) state
    rows — never the raw stream)."""
    from yat_geo_db_spark.relational.merge import merge_partial_aggregates

    states = spark.read.parquet(*_rollup_state_paths(spark, root))
    return merge_partial_aggregates(
        [states], key_cols, sum_cols=sum_cols, min_cols=min_cols,
        max_cols=max_cols, scale=scale,
    )


def compact_rollup(
    spark,
    root: str,
    key_cols: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
    scale: int = 4,
    orphan_grace_ms: int | None = None,
    lease_ms: int | None = None,
) -> None:
    """Fold batch states into the NEXT compacted generation dir
    (``_compacted_g<gen+1>-<token>``, unique per run) and remove the
    folded originals — bounds merge-on-read cost for long-lived
    streams. The compacted dir is itself a valid partial-aggregate
    state, so the sink keeps appending after.

    Crash-safe by construction — the atomic marker write is the single
    commit point:
    - the new generation is written to a uniquely-named dir NO reader
      looks at until the marker names it, so a crash before the marker
      commit leaves readers on the old generation + live batch dirs
      (complete, no double count; the orphan dir is swept by the next
      run);
    - the marker commit atomically switches readers to the new
      generation AND lists the folded dirs as ``pending`` so readers
      exclude them until they are actually deleted (a crash mid-delete
      re-resumes the deletes on the next run — never a re-fold);
    - a batch dir landing mid-compaction from a LIVE stream is neither
      folded nor deleted (the fold set is snapshotted first) and stays
      visible to readers throughout; a dir whose write is STILL IN
      FLIGHT at snapshot time (no _SUCCESS marker yet) is skipped —
      and so is everything above it, because `through` is a single
      watermark — both fold on the next run.

    Replay-safe: the max folded batch id is committed as ``through``,
    which the sink checks before writing (a replayed already-folded
    batch becomes a no-op instead of a double count). All marker and
    directory I/O goes through the Hadoop FileSystem API (fsio), so
    the protocol holds on HDFS/S3A, not just the driver's local disk.

    Unlike the old single-dir scheme, the merge never reads a dir it
    is about to overwrite, so no mid-plan materialization
    (localCheckpoint) is needed."""
    from yat_geo_db_spark.relational.merge import merge_partial_aggregates

    _compact_generational(
        spark,
        root,
        lambda states: merge_partial_aggregates(
            [states], key_cols, sum_cols=sum_cols, min_cols=min_cols,
            max_cols=max_cols, scale=scale,
        ),
        orphan_grace_ms=orphan_grace_ms,
        lease_ms=lease_ms,
    )


def _compact_generational(spark, root: str, fold,
                          orphan_grace_ms: int | None = None,
                          lease_ms: int | None = None) -> None:
    """The generational fold-and-commit protocol shared by every
    maintenance sink whose per-batch state is MERGEABLE (partial
    aggregates, CMS blobs, histogram counts): take the per-root
    compaction lease, snapshot the completed batch dirs down to their
    concrete part FILES, `fold` them (+ the current generation) into a
    fresh uniquely-named generation dir (``_compacted_g<gen+1>-
    <token>``), validate the snapshot is still exactly on disk, commit
    with one atomic marker write, then delete the folded originals.
    All the crash/replay/live-stream guarantees documented on
    compact_rollup live HERE; `fold` only defines the state algebra
    (states DataFrame in, merged DataFrame out — the output must be a
    valid per-batch state itself).

    Concurrency guarantees — compaction racing REPLAYED WRITES is
    closed (no silent double/under-count in any interleaving; worst
    case is a loud abort-and-retry); compaction racing ANOTHER
    COMPACTOR is excluded by the lease for duplicate WORK, and closed
    for duplicate COMMITS by the commit itself: the marker for
    generation N+1 is a versioned file created atomically-if-absent,
    so the commit is a compare-and-swap, not a last-writer-wins
    write:

    - The fold reads the snapshotted FILE paths, not dir paths. Spark
      part-file names are job-unique, so a replayed batch overwrite
      concurrent with the fold either leaves the snapshotted files
      untouched (the fold reads the complete, content-identical old
      commit) or deletes them mid-read — which FAILS the fold job
      (``ignoreMissingFiles`` defaults off) before any commit.
    - Pre-commit validation re-lists every fold dir and aborts unless
      its (files, _SUCCESS) snapshot is bit-identical — an overwrite
      that completed entirely inside the fold window (new unique file
      names) cannot slip through.
    - Mutual exclusion of compactors: the run holds
      ``<root>/_compact_lease`` (create-if-absent, unique token —
      atomic on HDFS; on local-FS/S3A the existence check is
      client-side and a lost create race degrades to the verify-abort
      below, see fsio.create_exclusive) for its whole duration; a
      second compactor refuses to start while the lease is younger
      than `lease_ms` (default 1 h), and may break only an older
      (presumed-crashed) one — or a zero-byte debris lease past a
      short grace. The token is re-verified immediately before the
      marker commit AND before the fold-dir deletes, so a holder that
      stalled past its lease and was displaced (or lost a client-side
      create race) aborts loudly instead of committing over the
      displacer.
    - Pre-commit validation also re-reads the marker and aborts if
      (through, gen, gendir) moved — a compactor that committed first
      wins; this one deletes its own orphan dir and raises. Unique
      generation-dir names mean the loser can never have overwritten
      the winner's committed output path.
    - The COMMIT is ``fsio.create_exclusive`` of the versioned marker
      ``_compacted_through_g<gen+1>`` (round 11 — the closure the
      round-10 protocol recorded as a deferral): readers discover the
      max-generation marker by listing (_read_marker), so the file's
      creation IS the atomic switch, and two compactors that both
      survived validation — one having stalled past the full lease
      window — can NEVER both believe they committed: exactly one
      create of gen+1 succeeds on any FS with atomic namespace
      creates (HDFS); the loser aborts BEFORE any delete and reclaims
      its own generation dir, so the interleaving costs duplicate
      fold work, never rows and never an orphan. The trade the
      deferral predicted is paid knowingly: marker reads are now
      list-and-max (one extra listStatus per read), and classic S3A's
      client-side existence check degrades the create race to exactly
      the lease's verify-abort behavior (see fsio.create_exclusive).
      Size `lease_ms` (and `orphan_grace_ms`) above the slowest
      plausible fold to avoid paying duplicate folds at all.
    - Orphan generation dirs (a compactor that crashed or lost the
      race after writing) are invisible to readers (the marker never
      named them) and are swept at the start of the next run — but
      ONLY past a modification-time grace period and only after
      re-reading the marker per candidate: without both guards a
      compactor holding a stale marker snapshot could delete a
      CONCURRENT run's just-written (or even just-committed)
      generation dir. A dir younger than `orphan_grace_ms` (default
      1 h, the janitor-lease pattern) is never touched; a genuinely
      crashed run's orphan ages past it and is reclaimed."""
    token = _acquire_compact_lease(
        spark, root, COMPACT_LEASE_MS if lease_ms is None else lease_ms
    )
    try:
        _compact_generational_locked(spark, root, fold, orphan_grace_ms,
                                     token)
    finally:
        _release_compact_lease(spark, root, token)


def _compact_generational_locked(spark, root: str, fold,
                                 orphan_grace_ms: int | None,
                                 token: str) -> None:
    import uuid

    through, gen, pending, gendir = _read_marker(spark, root)
    if pending:
        # resume a crashed cleanup: these dirs are fully folded into
        # the committed generation — finish deleting, then clear
        for n in pending:
            fsio.delete(spark, f"{root}/{n}", recursive=True)
        _write_marker(spark, root, through, gen, [], gendir)
    _sweep_orphan_generations(spark, root, orphan_grace_ms)
    listed = sorted(
        (bid, n)
        for n in fsio.list_dir_names(spark, root)
        if n.startswith("batch_id=")
        # non-numeric suffixes (manual backups) are not batch dirs
        and (bid := _batch_dir_id(n)) is not None
    )
    # fold ONLY completed writes (dir has _SUCCESS *in the same
    # listing as its part files* — fsio.list_data_files): a dir can
    # exist while its foreachBatch job is still committing, and
    # folding it would read a partial (or empty) batch, delete it, and
    # advance `through` past it — silent permanent loss. And because
    # `through` is a single watermark, nothing ABOVE the first
    # in-flight id may fold either (folding {0,1,3} while 2 is in
    # flight would set through=3 and make 2's replay a no-op). Skipped
    # dirs simply fold next time.
    names: list[str] = []
    snap: dict[str, list[str]] = {}
    for bid, n in listed:
        if bid != -1 and bid <= through:
            # stale replay of an already-folded batch id (the sink's
            # post-write re-check self-deletes it; see
            # _gated_batch_writer): its rows already live in the
            # generation — never fold it, never let it stall the
            # watermark. (-1 is the legacy compacted dir, real state.)
            continue
        files, committed = fsio.list_data_files(spark, f"{root}/{n}")
        if not committed:
            break
        names.append(n)
        snap[n] = files
    if not names:
        return
    fold_names = list(names)
    if gen >= 1:
        files, committed = fsio.list_data_files(spark, f"{root}/{gendir}")
        if not committed:
            raise FileNotFoundError(
                f"compaction marker at {root} names generation dir "
                f"{gendir!r} but it is absent or uncommitted — state "
                "corrupted (manual deletion / partial restore?)"
            )
        fold_names.append(gendir)
        snap[gendir] = files
    new_through = max(
        [
            int(n.split("=", 1)[1])
            for n in names
            if n != "batch_id=-1"  # legacy compacted dir, not a batch
        ]
        + [through]
    )
    fold_files = [
        f"{root}/{n}/{f}" for n in fold_names for f in snap[n]
    ]
    if not fold_files:
        return
    states = spark.read.parquet(*fold_files)
    merged = fold(states)
    new_gendir = f"{_GEN_PREFIX}{gen + 1}-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(f"{root}/{new_gendir}")

    def _abort(reason: str) -> None:
        fsio.delete(spark, f"{root}/{new_gendir}", recursive=True)
        raise RuntimeError(
            f"compaction of {root} aborted before commit ({reason}) — "
            "state unchanged; rerun"
        )

    m2 = _read_marker(spark, root)
    if (m2[0], m2[1], m2[3]) != (through, gen, gendir):
        _abort("a concurrent compaction committed first")
    for n in fold_names:
        if fsio.list_data_files(spark, f"{root}/{n}") != (snap[n], True):
            _abort(
                f"fold input {n} changed during the fold — a replayed "
                "batch overwrite raced this run"
            )
    if not fsio.list_data_files(spark, f"{root}/{new_gendir}")[1]:
        # own output vanished or lost its _SUCCESS (an external janitor
        # or concurrent run interfered) — committing a marker that
        # names it would poison every reader
        _abort("this run's generation dir is no longer committed on disk")
    if not _verify_compact_lease(spark, root, token):
        # stalled past the lease and was displaced — the thief may
        # have folded a DIFFERENT dir set; committing over them could
        # orphan rows. (With the exclusive commit below this is now
        # belt-and-braces: a displacer that already committed gen+1
        # makes our create fail; one that has NOT yet committed cannot
        # double-commit either way. The early check just turns the
        # common case into a cheaper, better-named abort.)
        _abort("a concurrent compaction broke this run's stale lease")
    # COMMIT — atomically CREATE the gen+1 marker (never overwrite):
    # readers switch to the new generation and exclude fold_names the
    # instant the file exists; of two racing compactors exactly one
    # can create it, so losing the race is discovered HERE, before any
    # delete, and costs only this run's own (self-reclaimed) fold dir.
    new_gen = _commit_marker_exclusive(
        spark, root, new_through, gen + 1, fold_names, new_gendir
    )
    if new_gen is None:
        _abort(
            f"a concurrent compaction committed generation {gen + 1} "
            "first (exclusive marker create refused)"
        )
    # Degenerate-filesystem fallback: where the no-overwrite create is
    # only a client-side existence check (local FS, classic S3A — see
    # fsio.create_exclusive), two simultaneous creators can BOTH get
    # True and the file holds one winner's content. Re-read and verify
    # OUR text survived (generation dirs carry a per-run uuid, so two
    # runs' texts can never collide): the loser aborts here, before
    # any delete, and reclaims its own unreferenced generation dir —
    # the same degradation the lease documents, never a double-commit.
    # On HDFS the create is an atomic NameNode op and this read always
    # verifies.
    committed = _marker_text(new_through, new_gen, fold_names, new_gendir)
    got = fsio.read_bytes(spark, f"{root}/{_marker_name(new_gen)}")
    if got is not None and got != committed.encode("utf-8"):
        _abort(
            "a simultaneous commit displaced this run's marker content "
            "(degenerate no-overwrite create on this filesystem)"
        )
    # got is None — our marker file is GONE: the only code path that
    # deletes a marker is a HIGHER-generation committer sweeping
    # superseded ones, so this is not displaced content but a fast
    # follower (or displacer) that already finished. Fall through to
    # the outranked-marker adjudication below, which distinguishes the
    # two by pending-list membership and gendir existence.
    # A creator stalled mid content-write PAST the empty-marker grace
    # can finish after a displacer escalated beyond its slot: its own
    # slot then verifies (its text IS there) while a higher generation
    # is already committed. Its fold-dir deletes would be benign (its
    # fold set is a subset of the displacer's pending list) but its
    # success report would be false — so the commit stands only if OUR
    # generation is still the maximum a reader would pick, with one
    # carve-out (ADVICE r12): a legitimate FAST FOLLOWER that read this
    # run's committed gen+1 marker and folded it forward into gen+2
    # before this re-read. That follower's marker lists OUR generation
    # dir pending — our commit STOOD and was folded forward, so report
    # success (the follower owns all remaining cleanup, including the
    # fold dirs it inherited as pending). Aborting here used to delete
    # new_gendir (benign — the follower folded it) but falsely report
    # "state unchanged; rerun".
    try:
        m3 = _read_marker(spark, root)
    except ValueError as e:
        # a corrupt higher marker (e.g. a gen+2 creator's partial
        # content flush). This run's OWN commit already stood — marker
        # created exclusively and content verified above — so unlike
        # the pre-commit aborts, new_gendir is COMMITTED state and must
        # NOT be reclaimed (the documented manual remedy deletes the
        # corrupt higher file and readers resume from exactly this
        # generation). Propagate with an honest status instead of the
        # pre-commit "state unchanged" wording.
        raise RuntimeError(
            f"compaction of {root} COMMITTED generation {new_gen} "
            f"({new_gendir}), but a later marker is corrupt and blocks "
            "readers — apply the manual remedy in the chained parse "
            "error; this run's generation dir and its fold inputs "
            "(pending in its marker) were left in place"
        ) from e
    if m3[1] != new_gen:
        if m3[1] > new_gen and new_gendir in m3[2]:
            # fast follower folded this run's generation forward and
            # still lists it pending: success, nothing left to clean
            return
        if m3[1] > new_gen and not fsio.exists(spark, f"{root}/{new_gendir}"):
            # the follower (or a follower CHAIN) already FINISHED: it
            # consumed this run's generation dir as a fold input and
            # deleted it, and its final marker no longer lists it
            # pending (two-step chains list only the previous link's
            # dir). Only a consumer that folded our committed
            # generation forward ever deletes our gendir — a DISPLACER
            # that escalated past a stalled slot folds from the prior
            # lineage and leaves our dir as orphan debris — so
            # missing-dir + higher marker means our commit stood and
            # was rolled forward: success. (If the dir still exists
            # and isn't pending anywhere, it IS displacer-orphaned and
            # the abort below correctly reclaims it.)
            return
        _abort(
            "a displacing compaction committed a higher generation "
            "while this run stalled mid-commit (outranked marker)"
        )
    for n in fold_names:
        fsio.delete(spark, f"{root}/{n}", recursive=True)
    _write_marker(spark, root, new_through, new_gen, [], new_gendir)
    _cleanup_superseded_markers(spark, root, new_gen)


def heavy_hitter_sink(
    root: str,
    key_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
):
    """foreachBatch maintenance of a streaming frequency monitor: each
    micro-batch reduces to ONE count-min sketch row (Spark's built-in
    count_min_sketch aggregate — scan-side fully distributed) plus the
    batch's distinct keys as candidate probes, written through the
    shared batch_id=N overwrite writer so at-least-once replay REPLACES
    a batch's contribution instead of double-counting. CMS counters add
    commutatively, so merge-of-batch-sketches is BIT-equal to one
    sketch of everything ever streamed (test-asserted), with the usual
    guarantee exact ≤ est ≤ exact + ε·N.

    State per batch: one blob (width ⌈e/ε⌉ × depth ⌈ln(1/(1−conf))⌉
    longs) + O(distinct keys in batch) candidate rows — the key column
    must be low-cardinality-probe-able (event types, domains), which is
    exactly the heavy-hitter use case."""
    def build(batch_df: DataFrame) -> DataFrame:
        # sketch over the STRING-cast key: the reader probes with Python
        # strings (UTF-8 byte hashing) — an integer-typed key would add
        # via addLong and never match a string probe
        sk = batch_df.groupBy().agg(
            F.expr(
                f"count_min_sketch(CAST({key_col} AS STRING), "
                f"{eps}d, {confidence}d, {seed})"
            ).alias("sk")
        ).select(F.lit(None).cast("string").alias("key"), "sk")
        keys = (
            batch_df.select(F.col(key_col).cast("string").alias("key"))
            .where(F.col("key").isNotNull())
            .distinct()
            .select("key", F.lit(None).cast("binary").alias("sk"))
        )
        return sk.unionByName(keys)

    return _gated_batch_writer(root, build)


def compact_heavy_hitters(spark, root: str,
                          orphan_grace_ms: int | None = None,
                          lease_ms: int | None = None) -> None:
    """Generational compaction for a heavy_hitter_sink target (the full
    compact_rollup crash/replay protocol via _compact_generational):
    CMS counters add commutatively, so the fold is one JVM mergeInPlace
    over the O(batches) blobs plus a distinct over the candidate keys —
    the folded output (one sketch row + one row per key) is itself a
    valid batch state, so sink and readers continue unchanged."""

    def fold(states: DataFrame) -> DataFrame:
        blobs = [
            bytes(r["sk"])
            for r in states.where(F.col("sk").isNotNull())
            .select("sk")
            .collect()
        ]
        keys = (
            states.where(F.col("key").isNotNull())
            .select("key")
            .distinct()
            .select("key", F.lit(None).cast("binary").alias("sk"))
        )
        merged = _merge_cms_blobs(spark, blobs)
        if merged is None:
            return keys
        out = spark._jvm.java.io.ByteArrayOutputStream()
        merged.writeTo(out)
        one = spark.createDataFrame(
            [(None, bytearray(bytes(out.toByteArray())))],
            "key string, sk binary",
        )
        return one.unionByName(keys)

    _compact_generational(spark, root, fold, orphan_grace_ms=orphan_grace_ms,
                          lease_ms=lease_ms)


def _merge_cms_blobs(spark, blobs: list[bytes]):
    """JVM-side mergeInPlace over serialized CountMinSketch blobs (all
    from the same (eps, confidence, seed) sink → merge-compatible)."""
    jvm = spark._jvm
    merged = None
    for b in blobs:
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(b)
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    return merged


def read_heavy_hitters(spark, root: str, min_count: int = 0) -> DataFrame:
    """Merge-on-read of a heavy_hitter_sink target: fold every live
    state dir's sketch blob (driver-side JVM merge over O(batches)
    small blobs — the metrics-store serving read; O(1) after
    compact_heavy_hitters) and probe the union of candidate keys.
    Returns (key, approx_count) for estimates >= min_count."""
    states = spark.read.parquet(*_rollup_state_paths(spark, root))
    blobs = [
        bytes(r["sk"])
        for r in states.where(F.col("sk").isNotNull()).select("sk").collect()
    ]
    keys = sorted(
        r["key"]
        for r in states.where(F.col("key").isNotNull())
        .select("key")
        .distinct()
        .collect()
    )
    merged = _merge_cms_blobs(spark, blobs)
    rows = [
        (k, int(merged.estimateCount(k)))
        for k in keys
        if merged is not None
    ]
    out = spark.createDataFrame(
        rows or [], "key string, approx_count long"
    )
    return out.where(F.col("approx_count") >= min_count)


def histogram_rollup_sink(
    root: str,
    key_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
):
    """foreachBatch maintenance of the QUANTILE leg of the rollup
    family: each micro-batch reduces to its per-key histogram_state
    (integer bin counts over the declared [lo, hi] domain — the domain
    is a contract, so every batch bins identically and states merge
    exactly) and is handed to the shared batch_id=N overwrite writer.
    At-least-once replay REPLACES a batch's counts; merge-on-read
    equals one-shot batch binning bit-for-bit (integer adds are
    associative). Compaction via _compacted_through as in
    rollup_maintenance_sink."""
    from yat_geo_db_spark.relational.merge import histogram_state

    return _gated_batch_writer(
        root,
        lambda batch_df: histogram_state(
            batch_df, key_cols, value_col, lo, hi, n_bins
        ),
    )


def read_histogram_quantiles(
    spark,
    root: str,
    key_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Merge-on-read of a histogram_rollup_sink target straight to
    per-key quantile estimates: fold every batch state (one hash
    shuffle over O(batches × keys × occupied-bins) count rows — never
    the raw stream) and interpolate. Error ≤ one bin width, exactly as
    in the batch path."""
    from yat_geo_db_spark.relational.merge import (
        merge_histogram_states,
        quantile_from_histogram,
    )

    states = spark.read.parquet(*_rollup_state_paths(spark, root))
    merged = merge_histogram_states([states], key_cols)
    return quantile_from_histogram(merged, key_cols, qs, lo, hi, n_bins)


def compact_histogram_rollup(spark, root: str, key_cols: list[str],
                             orphan_grace_ms: int | None = None,
                             lease_ms: int | None = None) -> None:
    """Generational compaction for a histogram_rollup_sink target:
    integer bin counts add exactly, so the fold is one hash aggregate
    over the folded states (merge_histogram_states) — the output is
    itself a valid per-batch state. Full compact_rollup crash/replay
    protocol via _compact_generational."""
    from yat_geo_db_spark.relational.merge import merge_histogram_states

    _compact_generational(
        spark, root,
        lambda states: merge_histogram_states([states], key_cols),
        orphan_grace_ms=orphan_grace_ms,
        lease_ms=lease_ms,
    )


def versioned_enrichment_sink(
    dim_root: str,
    on: list[str],
    target_dir: str,
    payload_cols: list[str] | None = None,
):
    """foreachBatch stream enrichment against a SLOWLY-REFRESHING
    dimension: every micro-batch re-reads the dimension's latest
    COMMITTED version (relational.layout.read_version — the _latest
    marker guarantees it never sees a half-written refresh) and
    broadcast-left-joins it in, so a dimension update published
    mid-stream applies from the next batch on. This is the pattern for
    stream⋈dim when the dim updates too often to bake into the query
    plan but too rarely for a stream-stream join. Output rides the
    batch_id=N overwrite writer: replays re-enrich with the CURRENT
    dimension (document this — at-least-once replay after a dim
    refresh is a re-enrichment, which is precisely what you want for
    corrections)."""
    inner = batch_partitioned_parquet_sink(target_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from yat_geo_db_spark.relational.layout import read_version

        dim = read_version(batch_df.sparkSession, dim_root)
        if payload_cols is not None:
            dim = dim.select(*on, *payload_cols)
        inner(batch_df.join(F.broadcast(dim), on, "left"), batch_id)

    return write_batch
